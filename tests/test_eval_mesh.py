"""Device-parallel evaluation on the 8-device virtual CPU mesh must
reproduce the single-device eval protocol exactly (same fused per-image
eval, images round-robined over the 'data' axis, host-merged
accumulators). The reference has no multi-device anything (SURVEY §2.11);
this pins our own design's equivalence to the serial protocol
(model/test.py:185-450 semantics)."""

import numpy as np
import pytest

from lang2seg_tpu.data.synthetic import synthetic_batch
from lang2seg_tpu.engine.evaluator import Evaluator
from lang2seg_tpu.engine.train_state import create_train_state
from lang2seg_tpu.parallel.mesh import make_mesh
from tests.test_network import tiny_config


def _eval_batches(cfg, n):
    out = []
    for s in range(n):
        b = synthetic_batch(cfg, 1, 2, seed=s)
        batch = {"images": b["images"], "im_hw": b["im_hw"],
                 "labels": b["labels"], "gt_boxes": b["gt_boxes"],
                 "gt_masks": b["gt_masks"], "im_scale": np.float32(1.0)}
        out.append(batch)
    # exercise the sentence-validity mask through the mesh path too
    out[1]["sent_valid"] = np.array([True, False])
    return out


def test_mesh_eval_matches_single_device():
    cfg = tiny_config()
    cfg.data.max_orig_h = cfg.data.canvas_h
    cfg.data.max_orig_w = cfg.data.canvas_w
    model, tx, state = create_train_state(cfg)
    ev = Evaluator(model, cfg, device_paste=True)

    batches = _eval_batches(cfg, 5)   # 5 images on 8 devices: pads 3
    ref = ev.eval_split(state.params, [dict(b) for b in batches])
    mesh = make_mesh(8)
    got = ev.eval_split_mesh(state.params, [dict(b) for b in batches],
                             mesh)
    assert got.keys() == ref.keys()
    for k in ref:
        assert got[k] == pytest.approx(ref[k], abs=1e-12), \
            (k, got[k], ref[k])


def test_batched_dispatch_matches_single_image():
    """images_per_dispatch > 1 (vmapped multi-image fused eval) must give
    byte-identical accumulator results to the per-image pipeline."""
    cfg = tiny_config()
    cfg.data.max_orig_h = cfg.data.canvas_h
    cfg.data.max_orig_w = cfg.data.canvas_w
    model, tx, state = create_train_state(cfg)
    ev = Evaluator(model, cfg, device_paste=True)
    batches = _eval_batches(cfg, 5)   # 5 images -> chunks of 3 + 2
    ref = ev.eval_split(state.params, [dict(b) for b in batches])
    got = ev.eval_split(state.params, [dict(b) for b in batches],
                        images_per_dispatch=3)
    assert got.keys() == ref.keys()
    for k in ref:
        assert got[k] == pytest.approx(ref[k], abs=1e-12), \
            (k, got[k], ref[k])


def test_full_chunks_dispatch_at_requested_size():
    """images_per_dispatch=3 (non-pow2) must dispatch full groups as 3,
    splitting only the partial remainder into pow2 sub-chunks (5 images
    -> [3, 2]); an earlier version pow2-split full groups too. Checked
    on both chunk entry points: _stage_chunk (stage_uploads=True, the
    default) and _dispatch_chunk (the inline path)."""
    cfg = tiny_config()
    cfg.data.max_orig_h = cfg.data.canvas_h
    cfg.data.max_orig_w = cfg.data.canvas_w
    model, tx, state = create_train_state(cfg)
    for stage in (True, False):
        ev = Evaluator(model, cfg, device_paste=True)
        sizes = []
        orig_stage = ev._stage_chunk

        def spy(chunk, valid_flags, put=False, _o=orig_stage):
            sizes.append(len(chunk))
            return _o(chunk, valid_flags, put)

        # both entry points funnel through _stage_chunk (inline
        # _dispatch_chunk composes it), so one spy covers each path
        ev._stage_chunk = spy
        ev.eval_split(state.params, _eval_batches(cfg, 5),
                      images_per_dispatch=3, stage_uploads=stage)
        assert sorted(sizes) == [2, 3], (stage, sizes)


def test_mesh_eval_mixed_sentence_buckets():
    """Bucketed production iterators (iter_test_batches(buckets=...))
    emit mixed sentence-pad sizes; mesh eval must group by bucket (one
    jit specialization per S) and still match the serial protocol."""
    cfg = tiny_config()
    cfg.data.max_orig_h = cfg.data.canvas_h
    cfg.data.max_orig_w = cfg.data.canvas_w
    model, tx, state = create_train_state(cfg)
    ev = Evaluator(model, cfg, device_paste=True)
    mesh = make_mesh(8)

    batches = _eval_batches(cfg, 3)
    # widen the last image to a 4-slot bucket (2 valid + 2 padded)
    b = batches[-1]
    b["labels"] = np.concatenate(
        [b["labels"], np.zeros_like(b["labels"])], axis=0)
    b["gt_boxes"] = np.concatenate(
        [b["gt_boxes"], np.zeros_like(b["gt_boxes"])], axis=0)
    b["gt_masks"] = np.concatenate(
        [b["gt_masks"], np.zeros_like(b["gt_masks"])], axis=0)
    b["sent_valid"] = np.array([True, True, False, False])

    ref = ev.eval_split(state.params, [dict(x) for x in batches])
    got = ev.eval_split_mesh(state.params, [dict(x) for x in batches],
                             mesh)
    assert got.keys() == ref.keys()
    for k in ref:
        assert got[k] == pytest.approx(ref[k], abs=1e-12), \
            (k, got[k], ref[k])


def test_mesh_eval_accepts_mask_bank_batches():
    """Bank-format batches (gt_mask_bank + mask_ref_idx) flow through the
    mesh path via host expansion and match the per-sentence result."""
    cfg = tiny_config()
    cfg.data.max_orig_h = cfg.data.canvas_h
    cfg.data.max_orig_w = cfg.data.canvas_w
    model, tx, state = create_train_state(cfg)
    ev = Evaluator(model, cfg, device_paste=True)
    mesh = make_mesh(8)

    per_sent = _eval_batches(cfg, 3)
    banked = []
    for b in per_sent:
        nb = dict(b)
        nb["gt_mask_bank"] = b["gt_masks"][:1]       # both sents, 1 ref
        nb["mask_ref_idx"] = np.zeros(2, np.int32)
        nb["gt_masks"] = np.repeat(b["gt_masks"][:1], 2, axis=0)
        banked.append(nb)
    ref = [dict(b, gt_masks=np.repeat(b["gt_masks"][:1], 2, axis=0))
           for b in per_sent]
    for b in banked:
        del b["gt_masks"]
    want = ev.eval_split_mesh(state.params, ref, mesh)
    got = ev.eval_split_mesh(state.params, banked, mesh)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-12), \
            (k, got[k], want[k])
