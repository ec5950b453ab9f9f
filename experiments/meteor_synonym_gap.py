"""Quantify the METEOR synonymy-stage gap (r4 verdict item 6).

Our METEOR is exact+stem unless a synonym file is supplied
(utils/caption_metrics.py:203-260); the reference ships only a jar
WRAPPER for METEOR 1.5 (evaluation/meteor/meteor.py — no jar in-tree),
so in-tree capability is matched, but the deviation was documented
without a number. This experiment puts a number on it:

  * builds a referring-expression-flavored synonym table (~40 groups,
    ~130 words: person/colour/object/position vocabulary);
  * generates a fixed (seed-pinned) set of 200 ref/pred pairs at three
    synonym-substitution rates (0.0 control, 0.3 typical, 1.0
    worst-case: every substitutable word replaced);
  * scores each set with meteor() and meteor(synonyms=...) and prints
    the deltas as one JSON line per rate.

The delta at rate 0.0 must be exactly 0 (the synonymy stage only ADDS
matches); the worst-case rate bounds how far the exact+stem score can
sit below a synonymy-enabled METEOR on synonym-saturated predictions.
Recorded in BASELINE.md.

Usage: python experiments/meteor_synonym_gap.py
"""

import json
import sys

import numpy as np

sys.path.insert(0, ".")

from lang2seg_tpu.utils.caption_metrics import meteor  # noqa: E402

GROUPS = [
    ["man", "guy", "male", "gentleman"], ["woman", "lady", "female"],
    ["kid", "child", "boy"], ["person", "human", "figure"],
    ["sofa", "couch"], ["cup", "mug"], ["car", "auto", "automobile"],
    ["bike", "bicycle"], ["tv", "television"], ["photo", "picture"],
    ["bag", "sack"], ["cap", "hat"], ["pants", "trousers"],
    ["shirt", "top"], ["sneakers", "shoes", "trainers"],
    ["big", "large", "huge"], ["small", "little", "tiny"],
    ["left", "leftmost"], ["right", "rightmost"],
    ["middle", "center", "central"], ["front", "foremost"],
    ["back", "rear", "behind"], ["near", "close", "nearby"],
    ["far", "distant"], ["dark", "shadowy"], ["bright", "light"],
    ["red", "crimson", "scarlet"], ["blue", "azure", "navy"],
    ["green", "emerald"], ["yellow", "golden", "gold"],
    ["white", "pale"], ["black", "ebony"], ["gray", "grey"],
    ["holding", "carrying", "grasping"], ["wearing", "dressed"],
    ["standing", "upright"], ["sitting", "seated"],
    ["walking", "strolling"], ["running", "sprinting"],
    ["looking", "gazing", "staring"],
]
FILLER = ["the", "a", "in", "on", "of", "next", "to", "with", "by"]


def build_sentences(rng, n, sub_rate):
    refs, preds = [], []
    for _ in range(n):
        length = rng.randint(4, 9)
        ref, pred = [], []
        for j in range(length):
            if rng.rand() < 0.35:
                w = FILLER[rng.randint(len(FILLER))]
                ref.append(w)
                pred.append(w)
            else:
                g = GROUPS[rng.randint(len(GROUPS))]
                ref.append(g[0])
                if len(g) > 1 and rng.rand() < sub_rate:
                    pred.append(g[1 + rng.randint(len(g) - 1)])
                else:
                    pred.append(g[0])
        refs.append([ref])
        preds.append(pred)
    return preds, refs


def main():
    syns = {}
    for g in GROUPS:
        fs = frozenset(g)
        for w in g:
            syns[w] = fs
    print(json.dumps({"groups": len(GROUPS),
                      "words": sum(len(g) for g in GROUPS)}), flush=True)
    for rate in (0.0, 0.3, 1.0):
        rng = np.random.RandomState(42)
        preds, refs = build_sentences(rng, 200, rate)
        base = meteor(preds, refs, synonyms={})
        syn = meteor(preds, refs, synonyms=syns)
        print(json.dumps({"sub_rate": rate,
                          "meteor_exact_stem": round(base, 4),
                          "meteor_with_synonyms": round(syn, 4),
                          "delta": round(syn - base, 4)}), flush=True)
        if rate == 0.0:
            assert abs(syn - base) < 1e-12, \
                "synonymy stage changed a synonym-free corpus"


if __name__ == "__main__":
    main()
