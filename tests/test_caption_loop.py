"""Closed-loop captioner workflow — the reference's README steps 3/5:
pretrain the att2in2 captioner (best-val checkpointing to model-best),
restore model-best into the CYCLE variant's captioner
(lib/caption_models/__init__.py:45-52), then generate expressions with
beam search through the restored network and score them with the
caption-metric stack (pyutils/refer/evaluation/refEvaluation.py).

The loop runs on real extracted features: extract_caption_features
(the res5_2 pairing of network_cycle_res5_2.py:415-448) over synthetic
images through the tiny backbone, a fixed caption per region, Adam
pretraining until the validation NLL collapses, and finally
BLEU/CIDEr of the restored decoder's beams vs the untrained decoder's.
"""

import jax
import numpy as np
import pytest

pytestmark = pytest.mark.slow


def _standardize(x):
    """Whiten raw backbone features: an untrained frozen-BN caffe
    ResNet emits activations at 1e3-1e4 scale (documented in the verify
    skill), which destabilizes Adam on the captioner's input
    projections. The reference pretrains from a TRAINED Mask R-CNN
    whose features are well-scaled; whitening stands in for that."""
    x = np.asarray(x, np.float32)
    return (x - x.mean()) / (x.std() + 1e-6)


@pytest.mark.timeout(1200)
def test_captioner_pretrain_restore_generate(tmp_path):
    import itertools

    import jax.numpy as jnp

    from lang2seg_tpu.cli.variants import apply_variant
    from lang2seg_tpu.data.synthetic import synthetic_batch
    from lang2seg_tpu.engine.train_captioner import (
        extract_caption_features, init_captioner_state, restore_captioner,
        run_captioner_training)
    from lang2seg_tpu.engine.train_state import create_train_state
    from lang2seg_tpu.utils.caption_metrics import RefEvaluation
    from tests.test_network import tiny_config

    cfg = tiny_config()
    apply_variant(cfg, "cycle_response")
    m = cfg.model
    m.vocab_size = 16
    m.cap_vocab_size = 16
    m.cap_seq_length = 6
    m.cap_rnn_size = 32
    m.cap_input_encoding_size = 32
    m.cap_att_hid_size = 32
    m.cap_drop_prob_lm = 0.0          # deterministic teacher forcing
    # fc/att features are concat(tail(a), tail(b)) -> 2 x 2048
    m.cap_fc_feat_size = 4096
    m.cap_att_feat_size = 4096

    model, tx, state = create_train_state(cfg)

    # ---- region features through the real extraction path (step 3's
    # feature prep): K expressions over 2 synthetic images ----
    K = 6
    b = synthetic_batch(cfg, 2, K, seed=3)
    fc, att = extract_caption_features(
        model, state.params,
        {"images": jnp.asarray(b["images"]),
         "gt_masks": jnp.asarray(b["gt_masks"]),
         "img_idx": jnp.asarray(b["img_idx"])}, cfg)
    assert fc.shape == (K, 4096) and att.shape == (K, 196, 4096)
    assert np.isfinite(np.asarray(fc)).all()
    fc = jnp.asarray(_standardize(fc))
    att = jnp.asarray(_standardize(att))

    # fixed 3-token caption per region (the learnable mapping)
    T = m.cap_seq_length + 2
    seq = np.zeros((K, T), np.int32)
    rng = np.random.RandomState(0)
    for k in range(K):
        seq[k, 1:4] = rng.permutation(np.arange(1, m.cap_vocab_size))[:3]
    mask = np.zeros((K, T), np.float32)
    mask[:, :5] = 1.0                  # BOS + 3 tokens + EOS
    seq, mask = jnp.asarray(seq), jnp.asarray(mask)

    # ---- step 3: pretrain with best-val tracking -> model-best.npz ----
    captioner, cap_state, _ = init_captioner_state(cfg)
    untrained_params = cap_state.params
    untrained_nll = float(captioner.apply(
        {"params": untrained_params}, fc, att, seq, mask, False,
        method=type(captioner).teacher_forced_nll))

    batch_iter = itertools.repeat((fc, att, seq, mask))
    res = run_captioner_training(
        cfg, batch_iter, max_iters=1000, iters_per_epoch=200,
        val_iter=itertools.repeat((fc, att, seq, mask)), val_every=100,
        ckpt_dir=str(tmp_path))
    assert (tmp_path / "model-best.npz").exists()
    assert res["best_val"] < 0.1 * untrained_nll, \
        (res["best_val"], untrained_nll)

    # ---- step 5: graft model-best into the cycle network ----
    restored = restore_captioner(state.params,
                                 str(tmp_path / "model-best.npz"))
    # every non-captioner subtree untouched, captioner replaced
    for key in state.params:
        if key == "captioner":
            continue
        same = jax.tree_util.tree_all(jax.tree_util.tree_map(
            lambda a, c: bool((np.asarray(a) == np.asarray(c)).all()),
            state.params[key], restored[key]))
        assert same, key
    got_leaf = np.asarray(jax.tree_util.tree_leaves(
        restored["captioner"])[0])
    old_leaf = np.asarray(jax.tree_util.tree_leaves(
        state.params["captioner"])[0])
    assert not np.array_equal(got_leaf, old_leaf)

    # ---- generate through the restored network + caption metrics ----
    def beams(params):
        s, _ = model.apply(
            {"params": params}, fc, att, 3,
            method=lambda mdl, f, a, n: mdl.captioner.sample_beam(f, a, n))
        return np.asarray(s)

    def score(pred_seqs):
        preds, gts = [], []
        for k in range(K):
            toks = [str(t) for t in pred_seqs[k] if t != 0]
            gt = [str(t) for t in np.asarray(seq)[k, 1:4]]
            preds.append({"ref_id": k, "sent": " ".join(toks)})
            gts.append({"ref_id": k,
                        "sentences": [{"sent": " ".join(gt)}]})
        return RefEvaluation(gts, preds).evaluate()

    trained_scores = score(beams(restored))
    untrained_scores = score(beams({**state.params,
                                    "captioner": untrained_params}))
    # the pretrained decoder must reproduce its captions; fresh init
    # emits unrelated tokens
    assert trained_scores["Bleu_1"] > untrained_scores["Bleu_1"] + 0.3, \
        (trained_scores, untrained_scores)
    assert trained_scores["CIDEr"] > untrained_scores["CIDEr"], \
        (trained_scores, untrained_scores)
    assert trained_scores["Bleu_1"] > 0.8, trained_scores
