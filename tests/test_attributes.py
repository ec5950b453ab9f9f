"""Attribute prediction: vocab plumbing, multi-label loss, P/R/F1 eval
(reference eval_easy_utils.py:17-91)."""

import json
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lang2seg_tpu.engine.attributes import compute_overall, eval_attributes


def test_compute_overall_golden():
    preds = [
        {"gd_att_wds": ["red", "big"], "pred_att_wds": ["red"]},
        {"gd_att_wds": ["small"], "pred_att_wds": ["small", "blue"]},
        {"gd_att_wds": ["white"], "pred_att_wds": []},
    ]
    # NC=2 (red, small), NP=3, NR=4
    out = compute_overall(preds)
    np.testing.assert_allclose(out["precision"], 2 / 3)
    np.testing.assert_allclose(out["recall"], 2 / 4)
    np.testing.assert_allclose(
        out["f1"], 2 * (2 / 3) * (1 / 2) / ((2 / 3) + (1 / 2)))


def test_compute_overall_empty():
    out = compute_overall([])
    assert out == {"precision": -1.0, "recall": -1.0, "f1": -1.0}


@pytest.fixture(scope="module")
def att_env(tmp_path_factory):
    from lang2seg_tpu.data.fixtures import make_mini_refer
    from lang2seg_tpu.data.prepro import run_prepro
    from lang2seg_tpu.data.loader import GtBatchLoader
    from tests.test_network import tiny_config

    root = str(tmp_path_factory.mktemp("att_data"))
    make_mini_refer(root)
    # refer-parser2-style attribute file: ref_id -> attribute words
    atts = {str(rid): (["red", "big"] if rid % 2 else ["small"])
            for rid in range(1, 13)}
    att_json = os.path.join(root, "atts.json")
    with open(att_json, "w") as f:
        json.dump(atts, f)
    out = os.path.join(root, "prepro")
    jp, hp = run_prepro(root, "refcoco", "unc", out, count_threshold=0,
                        att_json=att_json)
    cfg = tiny_config()
    cfg.data.image_dir = os.path.join(root, "images", "train2014")
    cfg.model.vocab_size = 64
    cfg.model.use_attribute_head = True
    cfg.model.num_attributes = 3        # red, big, small
    loader = GtBatchLoader(jp, hp, cfg, seed=3)
    return cfg, loader


def test_att_vocab_and_batch_labels(att_env):
    cfg, loader = att_env
    assert set(loader.att_to_ix) == {"red", "big", "small"}
    b = loader.get_batch("train", num_images=2, num_expr=4)
    assert b["att_labels"].shape == (4, 3)
    assert b["att_valid"].all()
    # multi-hot matches the ref's words
    mh = loader.att_multihot(1)   # ref 1 -> red, big
    assert mh[loader.att_to_ix["red"]] == 1.0
    assert mh[loader.att_to_ix["big"]] == 1.0
    assert mh.sum() == 2.0


def test_att_loss_and_eval_end_to_end(att_env):
    from lang2seg_tpu.engine.train_state import (create_train_state,
                                                 make_train_step)
    from lang2seg_tpu.models.network import Lang2Seg
    cfg, loader = att_env
    model, tx, state = create_train_state(cfg)
    step = make_train_step(model, cfg, tx)
    b = loader.get_batch("train", num_images=1, num_expr=2)
    dev = {k: jnp.asarray(v) for k, v in b.items()
           if k not in ("wrapped", "im_scales")}
    new_state, losses = step(state, dev)
    assert "loss_att" in losses
    assert np.isfinite(float(losses["loss_att"]))
    # head trains
    assert not np.array_equal(np.asarray(state.params["att_head"]["kernel"]),
                              np.asarray(new_state.params["att_head"]["kernel"]))

    score_fn = jax.jit(lambda img, boxes: model.apply(
        {"params": new_state.params}, img, boxes,
        method=Lang2Seg.predict_attribute_scores))
    res = eval_attributes(loader, score_fn, "val", max_refs=4)
    assert res["n_refs"] > 0
    o = res["overall"]
    assert o["recall"] >= -1 and o["f1"] <= 1.0
    # scores in [0,1] -> predictions are well-formed word lists
    assert isinstance(o["precision"], float)


def test_att_scores_uint8_wire_format_matches_float(att_env):
    """predict_attribute_scores must apply the same uint8 wire-format
    guard as train/test_forward: raw uint8 BGR canvases (the loader's
    default wire format) must score identically to pre-mean-subtracted
    float inputs (ADVICE r2: the missing guard silently fed 0-255 inputs
    to the backbone)."""
    from lang2seg_tpu.engine.train_state import create_train_state
    from lang2seg_tpu.models.network import Lang2Seg
    cfg, loader = att_env
    model, _, state = create_train_state(cfg)
    rng = np.random.RandomState(0)
    img_u8 = rng.randint(0, 256, (1, cfg.data.canvas_h, cfg.data.canvas_w,
                                  3)).astype(np.uint8)
    img_f32 = img_u8.astype(np.float32) - np.asarray(
        cfg.data.pixel_means_bgr, np.float32)
    boxes = np.asarray([[[4.0, 4.0, 60.0, 50.0], [10.0, 8.0, 90.0, 100.0]]],
                       np.float32)
    apply = lambda img: model.apply(  # noqa: E731
        {"params": state.params}, jnp.asarray(img), jnp.asarray(boxes),
        method=Lang2Seg.predict_attribute_scores)
    s_u8 = np.asarray(apply(img_u8))
    s_f32 = np.asarray(apply(img_f32))
    assert s_u8.shape == (1, 2, cfg.model.num_attributes)
    np.testing.assert_allclose(s_u8, s_f32, rtol=0, atol=1e-6)
    # and the scores genuinely depend on mean subtraction (relative
    # comparison: sigmoid saturates near 0/1 at scratch init)
    s_raw = np.asarray(apply(img_u8.astype(np.float32)))
    assert not np.allclose(s_raw, s_f32, rtol=1e-3, atol=0)
