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


def test_dets_loader_both_formats(tmp_path):
    import json
    from lang2seg_tpu.engine.comprehension import DetsLoader
    # reference flat format: xywh boxes (dets_loader.py:12-14)
    flat = {"dets": [
        {"det_id": 1, "box": [10, 20, 30, 40], "image_id": 100,
         "category_id": 1, "category_name": "person", "score": 0.9},
        {"det_id": 2, "box": [5, 5, 10, 10], "image_id": 100,
         "category_id": 18, "category_name": "dog", "score": 0.2},
        {"det_id": 3, "box": [0, 0, 50, 60], "image_id": 101,
         "category_id": 1, "category_name": "person", "score": 0.7}]}
    p1 = tmp_path / "dets_flat.json"
    p1.write_text(json.dumps(flat))
    dl = DetsLoader(str(p1))
    c = dl.candidates(100)
    np.testing.assert_allclose(c, [[10, 20, 39, 59], [5, 5, 14, 14]])
    # score filter + scale
    c = dl.candidates(100, scale=2.0, min_score=0.5)
    np.testing.assert_allclose(c, [[20, 40, 78, 118]])
    assert dl.candidates(999).shape == (0, 4)
    assert dl.Dets[3]["image_id"] == 101

    # image-keyed xyxy format
    keyed = {"100": [{"box": [1, 2, 3, 4], "score": 1.0}]}
    p2 = tmp_path / "dets_keyed.json"
    p2.write_text(json.dumps(keyed))
    dl2 = DetsLoader(str(p2))
    np.testing.assert_allclose(dl2.candidates(100), [[1, 2, 3, 4]])


def test_comprehension_eval_over_dets(setup, tmp_path):
    """eval_split_dets: candidates from a dets file, padded to fixed
    shape; an image with no dets is skipped and counted."""
    import json
    from lang2seg_tpu.engine.comprehension import DetsLoader
    cfg, model, state = setup
    ev = ComprehensionEvaluator(model, cfg)
    b = synthetic_batch(cfg, 1, 2, seed=11)
    gt = b["gt_boxes"][:, :4]
    dets = {"dets": [
        {"det_id": 1, "box": [float(gt[0, 0]), float(gt[0, 1]),
                              float(gt[0, 2] - gt[0, 0] + 1),
                              float(gt[0, 3] - gt[0, 1] + 1)],
         "image_id": 7, "category_id": 1, "category_name": "person",
         "score": 0.9},
        {"det_id": 2, "box": [2.0, 2.0, 20.0, 20.0], "image_id": 7,
         "category_id": 1, "category_name": "person", "score": 0.5}]}
    p = tmp_path / "dets.json"
    p.write_text(json.dumps(dets))
    dl = DetsLoader(str(p))

    batches = [
        {"images": b["images"], "labels": b["labels"], "gt_boxes":
         b["gt_boxes"], "image_id": 7, "im_scale": 1.0,
         "sent_valid": np.ones(2, bool)},
        {"images": b["images"], "labels": b["labels"], "gt_boxes":
         b["gt_boxes"], "image_id": 999, "im_scale": 1.0,
         "sent_valid": np.ones(2, bool)},   # no dets -> skipped
    ]
    r = ev.eval_split_dets(state.params, batches, dl, max_cands=8)
    assert r["n"] == 2
    assert r["skipped_no_dets"] == 2
    assert 0.0 <= r["comprehension_acc"] <= 1.0
