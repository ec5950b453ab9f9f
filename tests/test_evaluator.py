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
    ev = Evaluator(model, cfg, device_paste=False)
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


def test_device_paste_matches_host_protocol(rng):
    """The device paste-back + IoU (fixed-size buffers) must reproduce the
    host protocol (recover_masks + nearest gt resize + 122/255 threshold)
    pixel-for-pixel away from the float threshold boundary."""
    import jax.numpy as jnp
    from lang2seg_tpu.utils.metrics import nearest_resize

    hc, wc = 96, 128          # canvas (scaled frame)
    sh, sw = 90, 120          # scaled true extent
    ih, iw = 60, 80           # original extent
    oh, ow = 100, 130         # fixed device buffers (>= originals)
    s = 3
    probs = rng.rand(s, 14, 14).astype(np.float32)
    # keep away from the 122/255 threshold to dodge f32-vs-f64 flips
    probs = np.where(np.abs(probs - 122.0 / 255.0) < 0.02,
                     probs + 0.05, probs).astype(np.float32)
    boxes = np.array([[5.3, 8.1, 40.9, 40.2],
                      [-6.0, -3.0, 70.0, 50.0],     # clips at the edges
                      [20.0, 30.0, 90.0, 70.0]],    # clips bottom-right
                     np.float32)
    gt = (rng.rand(s, hc, wc) > 0.5).astype(np.uint8)

    inter_d, union_d = Evaluator._paste_iou_fn(
        jnp.asarray(probs), jnp.asarray(boxes), jnp.asarray(gt),
        jnp.int32(sh), jnp.int32(sw), jnp.int32(ih), jnp.int32(iw),
        oh=oh, ow=ow)
    # bit-packed wire format must produce identical counts
    inter_p, union_p = Evaluator._paste_iou_fn(
        jnp.asarray(probs), jnp.asarray(boxes),
        jnp.asarray(np.packbits(gt > 0, axis=-1)),
        jnp.int32(sh), jnp.int32(sw), jnp.int32(ih), jnp.int32(iw),
        oh=oh, ow=ow, packed=True)
    np.testing.assert_array_equal(np.asarray(inter_d), np.asarray(inter_p))
    np.testing.assert_array_equal(np.asarray(union_d), np.asarray(union_p))

    pasted = recover_masks(probs, boxes.copy(), ih, iw)
    pred = (pasted * 255.0 > 122.0)
    for i in range(s):
        gt_orig = nearest_resize(gt[i, :sh, :sw], ih, iw) > 0
        ih_ = np.logical_and(pred[i], gt_orig).sum()
        uh_ = np.logical_or(pred[i], gt_orig).sum()
        assert int(inter_d[i]) == int(ih_), (i, int(inter_d[i]), int(ih_))
        assert int(union_d[i]) == int(uh_), (i, int(union_d[i]), int(uh_))


def test_mask_bank_eval_matches_per_sentence():
    """The ref-deduped mask-bank wire format (gt_mask_bank +
    mask_ref_idx, device-side one-hot expansion) must produce the exact
    summary the per-sentence gt_masks format produces, through the real
    chunked eval_split path (including a padded partial chunk)."""
    cfg = tiny_config()
    model, tx, state = create_train_state(cfg)

    def batches(use_bank):
        out = []
        for seed in range(3):
            b = synthetic_batch(cfg, 1, 4, seed=seed)
            idx = np.array([0, 0, 1, 1], np.int32)     # 2 refs x 2 sents
            bank = np.stack([b["gt_masks"][0], b["gt_masks"][2]])
            gt_boxes = b["gt_boxes"].copy()
            gt_boxes[1] = gt_boxes[0]
            gt_boxes[3] = gt_boxes[2]
            base = {"images": b["images"], "im_hw": b["im_hw"],
                    "labels": b["labels"], "gt_boxes": gt_boxes,
                    "im_scale": np.float32(1.0),
                    "sent_valid": np.array([True, True, True, False])}
            if use_bank:
                base.update(gt_mask_bank=bank, mask_ref_idx=idx)
            else:
                base["gt_masks"] = bank[idx]
            out.append(base)
        return out

    # separate Evaluator instances so the per-image rng uids line up
    s_ps = Evaluator(model, cfg).eval_split(
        state.params, batches(False), images_per_dispatch=2)
    s_bk = Evaluator(model, cfg).eval_split(
        state.params, batches(True), images_per_dispatch=2)
    assert s_ps.keys() == s_bk.keys()
    for k in s_ps:
        assert abs(s_ps[k] - s_bk[k]) < 1e-9, (k, s_ps[k], s_bk[k])


def _uint8_eval_batch(cfg, num_expr, sh, sw, seed, use_bank=False):
    """A loader-style uint8 eval batch: mean-filled canvas with random
    content in [:sh, :sw] (data/loader.py:171-173 contract), zeros
    beyond the extent in the masks."""
    rng = np.random.RandomState(seed)
    d, m = cfg.data, cfg.model
    canvas = np.empty((1, d.canvas_h, d.canvas_w, 3), np.uint8)
    canvas[:] = np.round(np.asarray(d.pixel_means_bgr)).astype(np.uint8)
    canvas[0, :sh, :sw] = rng.randint(0, 256, (sh, sw, 3)).astype(np.uint8)
    labels = rng.randint(1, m.vocab_size,
                         (num_expr, d.max_len)).astype(np.int32)
    gt_boxes = np.zeros((num_expr, 5), np.float32)
    gt_masks = np.zeros((num_expr, d.canvas_h, d.canvas_w), np.uint8)
    for i in range(num_expr):
        x1, y1 = rng.uniform(0, sw * 0.4), rng.uniform(0, sh * 0.4)
        x2 = min(x1 + rng.uniform(sw * 0.2, sw * 0.5), sw - 1)
        y2 = min(y1 + rng.uniform(sh * 0.2, sh * 0.5), sh - 1)
        gt_boxes[i] = [x1, y1, x2, y2, rng.randint(1, m.num_classes)]
        gt_masks[i, int(y1):int(y2) + 1, int(x1):int(x2) + 1] = 1
    batch = {"images": canvas, "im_hw": np.asarray([[sh, sw]], np.float32),
             "labels": labels, "gt_boxes": gt_boxes,
             "im_scale": np.float32(1.0),
             "sent_valid": np.ones(num_expr, bool)}
    if use_bank:
        batch["gt_mask_bank"] = gt_masks
        batch["mask_ref_idx"] = np.arange(num_expr, dtype=np.int32)
    else:
        batch["gt_masks"] = gt_masks
    return batch


def test_extent_crop_inflate_recreates_canvas():
    """inflate(crop) must be BIT-EXACT to the loader's full canvases —
    mean fill beyond the image extent, zero fill beyond the mask crop —
    for raw and bit-packed masks alike."""
    cfg = tiny_config()
    cfg.data.wire_extent_granularity = 32
    model, tx, state = create_train_state(cfg)
    ev = Evaluator(model, cfg)
    b = _uint8_eval_batch(cfg, 2, sh=90, sw=150, seed=0)
    assert ev._crop_extent(90, 150) == (96, 160)
    assert ev._crop_extent(128, 192) is None       # full canvas: no crop
    hb, wb = 96, 160
    img_crop = np.ascontiguousarray(b["images"][:, :hb, :wb])
    gm = b["gt_masks"]
    # raw masks
    img_full, gm_full = ev._inflate(img_crop, gm[:, :hb, :wb],
                                    mask_w=gm.shape[-1])
    np.testing.assert_array_equal(np.asarray(img_full), b["images"])
    np.testing.assert_array_equal(np.asarray(gm_full), gm)
    # bit-packed masks
    packed = np.packbits(gm > 0, axis=-1)
    _, gmp_full = ev._inflate(img_crop,
                              np.packbits(gm[:, :hb, :wb] > 0, axis=-1),
                              mask_w=packed.shape[-1])
    np.testing.assert_array_equal(np.asarray(gmp_full), packed)


@pytest.mark.slow
@pytest.mark.parametrize("use_bank", [False, True])
def test_extent_crop_eval_matches_full_wire(use_bank):
    """The extent-crop wire (cfg.data.wire_extent_crop) must produce the
    exact eval summary the full-canvas wire produces, through both the
    single-image fused dispatch and the chunked vmap dispatch (including
    a chunk mixing two different extents)."""
    cfg_off = tiny_config()
    cfg_off.data.wire_extent_crop = False
    cfg_on = tiny_config()
    cfg_on.data.wire_extent_crop = True
    cfg_on.data.wire_extent_granularity = 32
    model, tx, state = create_train_state(cfg_on)

    def batches():
        return [_uint8_eval_batch(cfg_on, 2, sh=90, sw=150, seed=1,
                                  use_bank=use_bank),
                _uint8_eval_batch(cfg_on, 2, sh=64, sw=120, seed=2,
                                  use_bank=use_bank),
                _uint8_eval_batch(cfg_on, 2, sh=100, sw=160, seed=3,
                                  use_bank=use_bank)]

    for n_disp in (1, 2):
        s_off = Evaluator(model, cfg_off).eval_split(
            state.params, batches(), images_per_dispatch=n_disp)
        s_on = Evaluator(model, cfg_on).eval_split(
            state.params, batches(), images_per_dispatch=n_disp)
        assert s_off.keys() == s_on.keys()
        for k in s_off:
            assert abs(s_off[k] - s_on[k]) < 1e-9, \
                (n_disp, k, s_off[k], s_on[k])


def test_staged_uploads_match_inline_dispatch():
    """stage_uploads=True (background-thread stacking + async device_put,
    one chunk staged ahead) must produce the exact summary of the inline
    dispatch path — including partial-chunk splitting and the rng_uid
    sequence (staging is submitted in chunk order to one worker)."""
    cfg = tiny_config()
    model, tx, state = create_train_state(cfg)

    def batches():
        return [_uint8_eval_batch(cfg, 2, sh=90, sw=150, seed=s + 10)
                for s in range(5)]       # 2 full chunks + 1 partial

    s_inline = Evaluator(model, cfg).eval_split(
        state.params, batches(), images_per_dispatch=2,
        stage_uploads=False)
    s_staged = Evaluator(model, cfg).eval_split(
        state.params, batches(), images_per_dispatch=2,
        stage_uploads=True)
    assert s_inline.keys() == s_staged.keys()
    for k in s_inline:
        assert abs(s_inline[k] - s_staged[k]) < 1e-9, \
            (k, s_inline[k], s_staged[k])
