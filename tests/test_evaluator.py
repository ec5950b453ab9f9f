"""Evaluator pipeline test: synthetic image+GT through the full eval_split
protocol (forward -> global argmax -> mask paste-back -> metrics)."""

import numpy as np
import jax.numpy as jnp
import pytest

from lang2seg_tpu.data.synthetic import synthetic_batch
from lang2seg_tpu.engine.evaluator import Evaluator
from lang2seg_tpu.engine.train_state import create_train_state
from lang2seg_tpu.utils.metrics import (SegEvalAccumulator, np_box_iou,
                                        recover_masks, bilinear_resize)
from tests.test_network import tiny_config


def test_np_box_iou():
    a = np.array([0, 0, 9, 9], float)
    assert np_box_iou(a, a) == 1.0
    b = np.array([5, 0, 14, 9], float)
    # +1 convention: inter 5x10=50, union 100+100-50
    assert abs(np_box_iou(a, b) - 50 / 150) < 1e-9
    assert np_box_iou(a, np.array([20, 20, 30, 30], float)) == 0.0


def test_recover_masks_paste():
    probs = np.ones((1, 14, 14), np.float32)
    out = recover_masks(probs, np.array([[4.0, 6.0, 13.0, 15.0]]), 20, 20)
    assert out.shape == (1, 20, 20)
    assert out[0, 6:16, 4:14].min() == 1.0
    assert out[0, :6, :].max() == 0.0 and out[0, :, :4].max() == 0.0


def test_bilinear_resize_constant():
    x = np.full((5, 7), 3.25, np.float32)
    out = bilinear_resize(x, 11, 13)
    np.testing.assert_allclose(out, 3.25, rtol=1e-6)


def test_accumulator_summary():
    acc = SegEvalAccumulator()
    acc.add_detection([0, 0, 10, 10], [0, 0, 10, 10])      # hit
    acc.add_detection([0, 0, 10, 10], [50, 50, 60, 60])    # miss
    m = np.zeros((10, 10), np.uint8)
    m[:5] = 1
    acc.add_segmentation(m, m)                              # IoU 1
    acc.add_segmentation(m, 1 - m)                          # IoU 0
    s = acc.summary()
    assert s["det_acc"] == 0.5
    assert s["seg_prec@0.5"] == 0.5
    # cum_I = 50 + 0, cum_U = 50 + 100
    assert abs(s["overall_iou"] - 50 / 150) < 1e-9


def test_eval_image_end_to_end():
    cfg = tiny_config()
    model, tx, state = create_train_state(cfg)
    ev = Evaluator(model, cfg)
    b = synthetic_batch(cfg, 1, 2, seed=5)
    batch = {"images": b["images"], "im_hw": b["im_hw"],
             "labels": b["labels"], "gt_boxes": b["gt_boxes"],
             "gt_masks": b["gt_masks"], "im_scale": 1.0,
             "sent_valid": np.array([True, True])}
    acc = SegEvalAccumulator()
    ev.eval_image(state.params, batch, acc,
                  sent_valid=batch["sent_valid"])
    s = acc.summary()
    assert acc.num_sent == 2 and acc.seg_total == 2
    assert 0.0 <= s["det_acc"] <= 1.0
    assert 0.0 <= s["overall_iou"] <= 1.0
