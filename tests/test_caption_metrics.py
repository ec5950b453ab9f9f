"""Caption metric sanity + known-value tests (pure Python, fast)."""

import math

import numpy as np
import pytest

from lang2seg_tpu.utils.caption_metrics import (RefEvaluation, bleu, cider,
                                                meteor, ptb_tokenize,
                                                rouge_l, _lcs)


def test_tokenizer():
    assert ptb_tokenize("The left-most dog, sitting!") == \
        ["the", "left-most", "dog", "sitting"]
    assert ptb_tokenize("man's hat") == ["man", "'s", "hat"]


def test_bleu_perfect_match():
    c = [["the", "big", "red", "dog"]]
    r = [[["the", "big", "red", "dog"]]]
    scores = bleu(c, r)
    for s in scores:
        assert abs(s - 1.0) < 1e-9


def test_bleu_partial():
    c = [["the", "red", "cat"]]
    r = [[["the", "red", "dog"]]]
    b = bleu(c, r)
    assert abs(b[0] - 2.0 / 3) < 1e-9      # unigram precision 2/3
    assert b[3] < b[0]                      # higher n-grams lower


def test_bleu_brevity_penalty():
    c = [["the"]]
    r = [[["the", "red", "dog"]]]
    b = bleu(c, r)
    assert b[0] < 1.0                       # penalized despite P1=1
    assert abs(b[0] - math.exp(1 - 3)) < 1e-9


def test_lcs_and_rouge():
    assert _lcs("abcde", "ace") == 3
    c = [["the", "red", "dog"]]
    r = [[["the", "red", "dog"]]]
    assert abs(rouge_l(c, r) - 1.0) < 1e-9
    assert rouge_l([["blue"]], r) == 0.0


def test_cider_identical_beats_different():
    refs = [[["the", "red", "dog"]], [["a", "big", "cat"]]]
    good = [["the", "red", "dog"], ["a", "big", "cat"]]
    bad = [["something", "else", "entirely"], ["nothing", "matches", "here"]]
    assert cider(good, refs) > cider(bad, refs)
    assert cider(bad, refs) == 0.0


def test_meteor_ordering():
    refs = [[["the", "red", "dog", "runs"]]]
    exact = [["the", "red", "dog", "runs"]]
    partial = [["the", "dog", "red", "runs"]]  # same words, worse order
    none = [["completely", "different", "words", "here"]]
    assert meteor(exact, refs) > meteor(partial, refs) > meteor(none, refs)
    assert meteor(none, refs) == 0.0


def test_meteor_stem_match():
    refs = [[["the", "dog", "running"]]]
    cand = [["the", "dog", "runs"]]
    # 'running'/'runs' match via stemming ('runn' vs 'run'... both strip
    # to a shared prefix only if stems equal); at minimum exact words match
    assert meteor(cand, refs) > 0.5


def test_ref_evaluation_facade():
    refs = [{"ref_id": 1,
             "sentences": [{"sent": "the red dog"},
                           {"sent": "a crimson hound"}]},
            {"ref_id": 2, "sentences": [{"sent": "left person"}]}]
    preds = [{"ref_id": 1, "sent": "the red dog"},
             {"ref_id": 2, "sent": "right person"}]
    ev = RefEvaluation(refs, preds)
    out = ev.evaluate()
    for k in ("Bleu_1", "Bleu_4", "ROUGE_L", "CIDEr", "METEOR"):
        assert k in out
    assert 0 <= out["Bleu_1"] <= 1
    assert 1 in ev.refToEval and 2 in ev.refToEval


def test_meteor_synonym_stage(tmp_path):
    """The optional synonymy stage (load_synonyms + meteor(synonyms=...))
    must match words that share a synset — METEOR 1.5's third module
    (reference evaluation/meteor/meteor.py) — and raise the score for
    synonym-only overlaps."""
    from lang2seg_tpu.utils.caption_metrics import load_synonyms, meteor
    p = tmp_path / "synsets.txt"
    p.write_text("big large huge\nsmall tiny little\n")
    syn = load_synonyms(str(p))
    assert syn["big"] & syn["large"]
    assert not (syn["big"] & syn["tiny"])

    cand = [["the", "large", "dog"]]
    refs = [[["the", "big", "dog"]]]
    base = meteor(cand, refs)
    with_syn = meteor(cand, refs, synonyms=syn)
    assert with_syn > base
    # exact matches unaffected
    assert meteor(refs[0], refs, synonyms=syn) == meteor(refs[0], refs)
