"""Inference service (mrcn-wrapper parity) + comprehension evaluator."""

import numpy as np
import jax.numpy as jnp
import pytest

from lang2seg_tpu.data.synthetic import synthetic_batch
from lang2seg_tpu.engine.comprehension import ComprehensionEvaluator
from lang2seg_tpu.engine.inference import Inference
from lang2seg_tpu.engine.train_state import create_train_state
from tests.test_network import tiny_config


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_config()
    model, tx, state = create_train_state(cfg)
    return cfg, model, state


def test_inference_surface(setup):
    cfg, model, state = setup
    inf = Inference(model, state.params, cfg)
    b = synthetic_batch(cfg, 1, 2, seed=7)
    feats = np.asarray(inf.extract_head(b["images"]))
    assert feats.shape == (1, cfg.data.canvas_h // 16,
                           cfg.data.canvas_w // 16, 1024)
    out = inf.predict(b["images"], b["im_hw"], b["labels"])
    r = cfg.test.rpn_post_nms_top_n
    assert out["cls_prob"].shape == (2, r, 81)
    rois = jnp.asarray(out["rois"][:, :8, :])
    fc7 = inf.box_to_spatial_fc7(jnp.asarray(out["gated_conv"]), rois)
    assert fc7.shape[:2] == (2, 8)
    cls, box = inf.head_to_prediction(fc7)
    assert cls.shape == (16, 81) and box.shape == (16, 324)
    masks = inf.boxes_to_masks(jnp.asarray(out["gated_conv"]),
                               np.asarray(rois)[:, :2, :],
                               np.zeros((2, 2), np.int32) + 5)
    assert masks.shape == (2, 2, 14, 14)


def test_comprehension_eval(setup):
    cfg, model, state = setup
    ev = ComprehensionEvaluator(model, cfg)
    b = synthetic_batch(cfg, 1, 2, seed=11)
    cands = np.concatenate([b["gt_boxes"][:, :4],
                            np.array([[5.0, 5.0, 30.0, 30.0]],
                                     np.float32)], 0)
    r = ev.eval_image(state.params,
                      {"images": b["images"], "labels": b["labels"]},
                      cands, b["gt_boxes"][:, :4])
    assert r["n"] == 2 and 0 <= r["hits"] <= 2
