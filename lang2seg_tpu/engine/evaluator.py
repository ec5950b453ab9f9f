"""Referring-expression evaluation.

Parity: reference eval_split (`model/test.py:185-450`) — per sentence:
forward in TEST mode (NMS 6000/300), decode per-class boxes in
ORIGINAL-image coordinates (im_detect, test.py:97-129), pick the single
global argmax over scores[:, 1:] (all ROIs x classes 1..80), detection hit
if IoU(pred_box, gt_box) >= 0.5, then run the mask branch on that one box
(scaled back up), paste the 14x14 probs to the original image and binarize
at 122/255, accumulate I/U and Prec@{0.5..0.9}.

TPU-native departure: the reference forwards one sentence at a time and
re-runs the backbone per sentence; here all sentences of an image are
batched into one jitted test_forward (backbone runs once), and only the
tiny argmax/paste-back runs on host.
"""

from __future__ import annotations

import functools
from typing import Dict, Iterable, Optional

import numpy as np
import jax
import jax.numpy as jnp

from lang2seg_tpu.config import Config
from lang2seg_tpu.models.network import Lang2Seg
from lang2seg_tpu.ops.boxes import decode_boxes
from lang2seg_tpu.utils.metrics import (SegEvalAccumulator, nearest_resize,
                                        recover_masks, recover_masks_ref,
                                        scipy_imresize)


def _expand_mask_bank(bank: jnp.ndarray, ref_idx: jnp.ndarray) -> jnp.ndarray:
    """Per-sentence masks from a ref-deduped bank (wire format
    cfg.data.wire_mask_bank): equivalent to bank[ref_idx], but expressed
    as an exact one-hot byte matmul — a leading-axis gather at
    (S, Hc, Wc) scale lowers pathologically on this TPU while the
    (S, R) @ (R, P) matmul rides the MXU. Works on raw {0,1} masks and
    bit-packed bytes alike (byte values <= 255 are exact in f32)."""
    r = bank.shape[0]
    onehot = (ref_idx[:, None] == jnp.arange(r)[None, :]) \
        .astype(jnp.float32)
    flat = bank.reshape(r, -1).astype(jnp.float32)
    return (onehot @ flat).astype(bank.dtype).reshape(
        (ref_idx.shape[0],) + bank.shape[1:])


def _host_expand_bank(batch: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Host-side bank -> per-sentence expansion for the code paths that
    consume batch["gt_masks"] directly (host-paste oracle, mesh chunks
    with non-uniform bank sizes). No-op when the batch already carries
    per-sentence masks."""
    if "gt_mask_bank" not in batch or "gt_masks" in batch:
        return batch
    out = dict(batch)
    out["gt_masks"] = np.asarray(out.pop("gt_mask_bank"))[
        np.asarray(out.pop("mask_ref_idx"), np.int64)]
    return out


class Evaluator:
    def __init__(self, model: Lang2Seg, cfg: Config,
                 device_paste: bool = True, reference_exact: bool = False):
        """device_paste: run the mask paste-back + IoU accumulation on
        device with fixed-size original-resolution buffers (COCO images
        are <= 640/side). The host path (utils/metrics.recover_masks) is
        the parity oracle; measured ~2.5x eval throughput (the host loop
        was the eval bottleneck: ~270ms/image of single-core NumPy).

        reference_exact: reproduce the reference's metric chain
        bit-for-bit on host — scipy-imresize paste-back with its
        bytescale adaptive rescale (utils/mask_utils.py:43-72, threshold
        model/test.py:334) and PIL-nearest GT resize (test.py:338) —
        instead of the direct [0,1]-prob bilinear + fixed 122/255 cut.
        Forces the host-paste path; pair with
        cfg.data.reference_exact_masks for the loader side. Measured
        deltas vs the default mode: BASELINE.md."""
        self.model = model
        self.cfg = cfg
        self.reference_exact = reference_exact
        if reference_exact:
            device_paste = False
        self.device_paste = device_paste
        means = jnp.asarray(cfg.data.pixel_means_bgr, jnp.float32)
        d = cfg.data
        self._extent_crop = bool(d.wire_extent_crop)
        self._extent_g = int(d.wire_extent_granularity)
        if self._extent_crop:
            assert self._extent_g % 8 == 0, \
                "wire_extent_granularity must be a multiple of 8 " \
                "(bit-packed masks crop at byte boundaries)"
        means_u8 = jnp.asarray(
            np.round(np.asarray(d.pixel_means_bgr)).astype(np.uint8))
        ch, cw = d.canvas_h, d.canvas_w

        def inflate(images, masks, *, mask_w):
            """Re-create the loader's full canvases ON DEVICE from
            content-extent crops (wire format cfg.data.wire_extent_crop):
            images (..., hb, wb, 3) uint8 -> (..., ch, cw, 3) padded with
            the ROUNDED pixel means — exactly what the loader writes
            outside the content extent (data/loader.py:171-173) — and
            masks (..., hb, wm) uint8 (bit-packed or raw) ->
            (..., ch, mask_w) zero-padded (the loader writes mask content
            only inside [:sh, :sw]). Tiny jits, one per crop shape; the
            outputs stay on device and feed the big fused eval
            executables, whose shapes never change."""
            hb, wb = images.shape[-3], images.shape[-2]
            if wb < cw:
                pad = jnp.broadcast_to(means_u8,
                                       images.shape[:-2] + (cw - wb, 3))
                images = jnp.concatenate([images, pad], axis=-2)
            if hb < ch:
                pad = jnp.broadcast_to(means_u8,
                                       images.shape[:-3] + (ch - hb, cw, 3))
                images = jnp.concatenate([images, pad], axis=-3)
            pw = ([(0, 0)] * (masks.ndim - 2)
                  + [(0, ch - hb), (0, mask_w - masks.shape[-1])])
            return images, jnp.pad(masks, pw)

        self._inflate = jax.jit(inflate, static_argnames=("mask_w",))

        def fwd(p, b):
            if b["images"].dtype == jnp.uint8:
                # wire format: raw uint8 BGR — 4x less host->device
                # transfer than the mean-subtracted f32 canvas (the
                # link, not the chip, bounds eval); subtract on device
                b = dict(b, images=b["images"].astype(jnp.float32) - means)
            return model.apply({"params": p}, b,
                               method=Lang2Seg.test_forward)

        self._fwd = jax.jit(fwd)
        self._mask_fwd = jax.jit(
            lambda p, conv, boxes, labels: model.apply(
                {"params": p}, conv, boxes, labels,
                method=Lang2Seg.predict_masks))
        self._select = jax.jit(self._select_fn)
        # per-image uid folded into test_forward's proposal key so
        # TEST.MODE='top' re-draws its random pad per image (the reference
        # re-draws per call, proposal_top_layer.py:40)
        self._rng_uid = 0

        # the whole per-image eval as ONE jit: on the tunneled device each
        # dispatch/eager op is a round trip, and the split-jits loop paid
        # ~10 of them per image — more than the eval compute itself
        def eval_all(p, images, im_hw, labels, rng_uid, gm, scale, sh, sw,
                     ih, iw, *, packed):
            out = fwd(p, {"images": images, "im_hw": im_hw,
                          "labels": labels, "rng_uid": rng_uid})
            sel, cls = self._select_fn(
                out["rois"], out["bbox_pred"], out["cls_prob"],
                out["roi_valid"], scale.astype(jnp.float32),
                ih.astype(jnp.float32), iw.astype(jnp.float32))
            probs = model.apply(
                {"params": p}, out["gated_conv"],
                (sel * scale.astype(jnp.float32))[:, None, :],
                cls[:, None], method=Lang2Seg.predict_masks)[:, 0]
            inter, union = self._paste_iou_fn(
                probs, sel, gm, sh, sw, ih, iw,
                oh=cfg.data.max_orig_h, ow=cfg.data.max_orig_w,
                packed=packed)
            return sel, cls, inter, union

        self._eval_all_core = eval_all

        def eval_all_bank(p, images, im_hw, labels, rng_uid, bank,
                          ref_idx, scale, sh, sw, ih, iw, *, packed):
            gm = _expand_mask_bank(bank, ref_idx)
            return eval_all(p, images, im_hw, labels, rng_uid, gm,
                            scale, sh, sw, ih, iw, packed=packed)

        self._eval_all_core_bank = eval_all_bank
        self._eval_all = jax.jit(functools.partial(eval_all, packed=False))
        self._eval_all_packed = jax.jit(functools.partial(eval_all,
                                                          packed=True))
        self._eval_all_bank = jax.jit(
            functools.partial(eval_all_bank, packed=False))
        self._eval_all_bank_packed = jax.jit(
            functools.partial(eval_all_bank, packed=True))
        self._mesh_fns = {}

    def _mesh_eval_fn(self, mesh, packed: bool, num_sents: int):
        """One jit: N images evaluated device-parallel over the mesh's
        'data' axis (SURVEY §2.11 charter — the reference is single-GPU
        everywhere, so multi-device eval is our own design). Each device
        runs the identical single-image fused eval on its own image;
        per-image scalars ride as length-N arrays sharded like the data.
        Cached per (packed, S) since jit specializes on shapes."""
        from jax import shard_map
        from jax.sharding import PartitionSpec as P
        key = (id(mesh), packed, num_sents)
        if key in self._mesh_fns:
            return self._mesh_fns[key]
        core = functools.partial(self._eval_all_core, packed=packed)

        def shard_fn(p, images, im_hw, labels, rng_uid, gm, scale, sh, sw,
                     ih, iw):
            sel, cls, inter, union = core(
                p, images[0], im_hw[0], labels[0], rng_uid[0], gm[0],
                scale[0], sh[0], sw[0], ih[0], iw[0])
            return sel[None], cls[None], inter[None], union[None]

        mapped = shard_map(
            shard_fn, mesh=mesh,
            in_specs=(P(),) + (P("data"),) * 10,
            out_specs=(P("data"),) * 4, check_vma=False)

        def wrapped(p, *ops):
            # all-gather the (tiny: per-image sel boxes + per-sentence
            # scalars) outputs to every device so each PROCESS of a
            # multi-host mesh can drain the full chunk on host; free on
            # a single host, one small ICI gather on a pod
            rep = jax.sharding.NamedSharding(mesh, P())
            return tuple(jax.lax.with_sharding_constraint(o, rep)
                         for o in mapped(p, *ops))

        fn = jax.jit(wrapped)
        self._mesh_fns[key] = fn
        return fn

    def _batched_eval_fn(self, packed: bool, n: int, num_sents: int,
                         bank: bool = False):
        """Single-device N-image fused eval (vmap over the per-image
        core): on the tunneled link each dispatch costs a full round
        trip, so batching n same-bucket images into ONE jit call
        amortizes dispatch+transfer n-fold. Cached per (packed, n, S,
        bank); `bank` selects the ref-deduped mask-bank operand layout
        (one extra mask_ref_idx operand, device-side expansion)."""
        key = ("vmap", packed, n, num_sents, bank)
        if key in self._mesh_fns:
            return self._mesh_fns[key]
        core = functools.partial(
            self._eval_all_core_bank if bank else self._eval_all_core,
            packed=packed)

        def fn(p, *ops):
            return jax.vmap(lambda *a: core(p, *a))(*ops)

        jfn = jax.jit(fn)
        self._mesh_fns[key] = jfn
        return jfn

    def _extents(self, batch):
        """(scale, sh, sw, ih, iw) for one image batch — the single
        definition of the scaled/original extent math used by every
        dispatch path (the rounding order matters: ih derives from the
        ALREADY-ROUNDED sh so routing decisions and dispatch asserts
        can never disagree by one pixel)."""
        scale = float(batch["im_scale"])
        sh = int(round(float(batch["im_hw"][0][0])))
        sw = int(round(float(batch["im_hw"][0][1])))
        ih = int(round(sh / scale))
        iw = int(round(sw / scale))
        return scale, sh, sw, ih, iw

    def _fits(self, ih: int, iw: int) -> bool:
        """Whether an original extent fits the device-paste buffers."""
        return (ih <= self.cfg.data.max_orig_h
                and iw <= self.cfg.data.max_orig_w)

    def _crop_extent(self, sh: int, sw: int):
        """Bucketed content extent (hb, wb) for the extent-crop wire
        (cfg.data.wire_extent_crop), or None when cropping is disabled
        or would not drop any canvas bytes. Buckets round the scaled
        extent up to wire_extent_granularity so the tiny device-pad jit
        specializes on a handful of shapes per run, not per image."""
        if not self._extent_crop:
            return None
        g, dd = self._extent_g, self.cfg.data
        hb = min(dd.canvas_h, -(-int(sh) // g) * g)
        wb = min(dd.canvas_w, -(-int(sw) // g) * g)
        if hb >= dd.canvas_h and wb >= dd.canvas_w:
            return None
        return hb, wb

    def _stack_chunk(self, chunk, crop: bool = False):
        """Stacked jit operands + extent arrays for one multi-image
        chunk — shared by the single-device vmap dispatch and the mesh
        dispatch. All images must share the sentence-bucket size (and,
        for the bank wire format, the bank row count).

        crop: apply the extent-crop wire (upload only the chunk-max
        bucketed content extent, re-inflate on device) — used by the
        single-device dispatch; the mesh dispatch keeps raw numpy
        operands so jit can shard the transfer across devices."""
        s = chunk[0]["labels"].shape[0]
        assert all(b["labels"].shape[0] == s for b in chunk), \
            "chunk needs a uniform sentence-bucket size"
        exts = [self._extents(b) for b in chunk]
        scales = np.asarray([e[0] for e in exts], np.float32)
        sh = np.asarray([e[1] for e in exts], np.int32)
        sw = np.asarray([e[2] for e in exts], np.int32)
        ih = np.asarray([e[3] for e in exts], np.int32)
        iw = np.asarray([e[4] for e in exts], np.int32)
        assert all(self._fits(h, w) for h, w in zip(ih, iw)), \
            "original extents exceed the device-paste buffers"
        use_bank = "gt_mask_bank" in chunk[0]
        if use_bank:
            gms = [np.asarray(b["gt_mask_bank"]) for b in chunk]
            assert all(g.shape[0] == gms[0].shape[0] for g in gms), \
                "bank chunks need a uniform bank row count"
        else:
            gms = [np.asarray(b["gt_masks"]) for b in chunk]
        packed = gms[0].shape[-1] % 8 == 0
        imgs = np.stack([np.asarray(b["images"]) for b in chunk])
        ext = (self._crop_extent(sh.max(), sw.max())
               if crop and imgs.dtype == np.uint8 else None)
        if ext is not None:
            # extent-crop wire: ship the chunk-max bucketed content
            # extent only; the device pad re-creates the full canvases
            # exactly (mean fill / zero fill beyond each image's own
            # extent is what the loader wrote there)
            hb, wb = ext
            mask_w = gms[0].shape[-1] // 8 if packed else gms[0].shape[-1]
            gm_stack = np.stack(
                [np.packbits(g[..., :hb, :wb] > 0, axis=-1) if packed
                 else g[..., :hb, :wb] for g in gms])
            img_op, gm_op = self._inflate(
                np.ascontiguousarray(imgs[:, :, :hb, :wb]), gm_stack,
                mask_w=mask_w)
        else:
            img_op = imgs
            gm_op = np.stack([np.packbits(g > 0, axis=-1) if packed
                              else g for g in gms])
        uids = []
        for _ in chunk:
            self._rng_uid += 1
            uids.append(self._rng_uid)
        mask_ops = (gm_op,)
        if use_bank:
            mask_ops += (np.stack([np.asarray(b["mask_ref_idx"], np.int32)
                                   for b in chunk]),)
        ops = (img_op,
               np.stack([np.asarray(b["im_hw"], np.float32)
                         for b in chunk]),
               np.stack([np.asarray(b["labels"]) for b in chunk]),
               np.asarray(uids, np.int32), *mask_ops,
               scales, sh, sw, ih, iw)
        return ops, scales, s, packed, use_bank

    def _stage_chunk(self, chunk, valid_flags, put: bool = False):
        """Host half of a chunk dispatch: stack the operands and (with
        `put`) start their host->device copies via `jax.device_put`,
        which enqueues asynchronously — the copies ride the link while
        earlier chunks compute. Safe to run on a background thread (the
        staging executor in eval_split): pure numpy work + async puts,
        no jit dispatch. rng_uid order is preserved because staging is
        submitted in chunk order to a single worker."""
        ops, scales, s, packed, use_bank = self._stack_chunk(chunk,
                                                             crop=True)
        if put:
            ops = tuple(jax.device_put(o) for o in ops)
        return {"chunk": chunk, "valid_flags": valid_flags,
                "scales": scales, "ops": ops, "s": s, "packed": packed,
                "use_bank": use_bank}

    def _dispatch_staged(self, params, st):
        """Device half: jit-call the fused eval on staged operands (no
        blocking readback). With pre-put operands the call enqueues
        immediately instead of blocking the host on the transfer."""
        fn = self._batched_eval_fn(st["packed"], len(st["chunk"]),
                                   st["s"], bank=st["use_bank"])
        sel, cls, inter, union = fn(params, *st["ops"])
        return {"chunk": st["chunk"], "valid_flags": st["valid_flags"],
                "scales": st["scales"], "sel": sel, "inter": inter,
                "union": union}

    def _dispatch_chunk(self, params, chunk, valid_flags):
        """Issue one fused multi-image dispatch (no blocking readback)."""
        return self._dispatch_staged(
            params, self._stage_chunk(chunk, valid_flags))

    def _drain_chunk(self, rec, acc: SegEvalAccumulator) -> int:
        sel = np.asarray(rec["sel"])
        inter = np.asarray(rec["inter"])
        union = np.asarray(rec["union"])
        for d, b in enumerate(rec["chunk"]):
            sv = rec["valid_flags"][d]
            for i in range(sel.shape[1]):
                if not sv[i]:
                    continue
                gt_box = np.asarray(b["gt_boxes"][i, :4]) / rec["scales"][d]
                acc.add_detection(sel[d, i], gt_box)
                acc.add_segmentation_iu(int(inter[d, i]),
                                        int(union[d, i]))
        return len(rec["chunk"])

    @staticmethod
    def _select_fn(rois, deltas, scores, valid, scale, ih, iw):
        """Device-side batched argmax protocol over all S sentences at
        once (test.py:256-259): decode per-class boxes in original-image
        coords, mask padded rois, global argmax over scores[:, 1:], select
        that class's box."""
        s, r, _ = rois.shape
        num_classes = scores.shape[-1]
        boxes_orig = rois / scale
        pred = jax.vmap(decode_boxes)(boxes_orig, deltas)   # (S, R, 4K)
        pk = pred.reshape(s, r, num_classes, 4)
        pk = jnp.stack([jnp.clip(pk[..., 0], 0, iw - 1.0),
                        jnp.clip(pk[..., 1], 0, ih - 1.0),
                        jnp.clip(pk[..., 2], 0, iw - 1.0),
                        jnp.clip(pk[..., 3], 0, ih - 1.0)], axis=-1)
        sc = jnp.where(valid[..., None], scores, -1.0)      # (S, R, K)
        flat = sc[:, :, 1:].reshape(s, -1)
        idx = jnp.argmax(flat, axis=1)
        r_idx = idx // (num_classes - 1)
        cls = idx % (num_classes - 1) + 1
        sel = pk[jnp.arange(s), r_idx, cls]                 # (S, 4)
        return sel, cls.astype(jnp.int32)

    @staticmethod
    def _paste_iou_fn(mask_probs, boxes, gt_masks, sh, sw, ih, iw, *,
                      oh: int, ow: int, packed: bool = False):
        """Device paste-back + IoU, batched over sentences.

        Exactly the host protocol (utils/metrics.recover_masks +
        nearest_resize + 122/255 threshold) on fixed (oh, ow) buffers:
        mask_probs (S, M, M) in [0,1]; boxes (S, 4) xyxy in ORIGINAL
        image coords; gt_masks: (S, Hc, Wc) uint8 canvas-sized, or
        BIT-PACKED (S, Hc, Wc//8) uint8 (np.packbits along the last axis,
        MSB-first) — 8x less host->device transfer on the binary masks;
        sh/sw the scaled true extent, ih/iw the original extent (traced
        scalars). Returns per-sentence (I, U) pixel counts over the
        (ih, iw) region.
        """
        s, m, _ = mask_probs.shape
        ih = ih.astype(jnp.int32)
        iw = iw.astype(jnp.int32)
        if packed:
            # unpack MSB-first bits -> (S, Hc, Wc) {0,1}
            shifts = jnp.arange(7, -1, -1, dtype=jnp.uint8)
            bits = (gt_masks[..., None] >> shifts) & jnp.uint8(1)
            gt_masks = bits.reshape(gt_masks.shape[0], gt_masks.shape[1],
                                    gt_masks.shape[2] * 8)

        # int-truncated, clipped box corners (recover_masks semantics)
        x1 = jnp.clip(boxes[:, 0], 0, (iw - 1).astype(jnp.float32))
        y1 = jnp.clip(boxes[:, 1], 0, (ih - 1).astype(jnp.float32))
        x2 = jnp.clip(boxes[:, 2], 0, (iw - 1).astype(jnp.float32))
        y2 = jnp.clip(boxes[:, 3], 0, (ih - 1).astype(jnp.float32))
        x1 = x1.astype(jnp.int32); y1 = y1.astype(jnp.int32)
        x2 = x2.astype(jnp.int32); y2 = y2.astype(jnp.int32)
        bh = (y2 - y1 + 1).astype(jnp.float32)                   # (S,)
        bw = (x2 - x1 + 1).astype(jnp.float32)

        def axis_weights(p0, extent, size):
            """(S, size, M) separable half-pixel bilinear weights of the
            box-resized mask along one axis; zero outside the box."""
            pos = jnp.arange(size, dtype=jnp.float32)[None, :]   # (1, size)
            p = pos - p0[:, None].astype(jnp.float32)            # (S, size)
            src = (p + 0.5) * m / extent[:, None] - 0.5
            s0 = jnp.clip(jnp.floor(src), 0, m - 1).astype(jnp.int32)
            s1 = jnp.clip(s0 + 1, 0, m - 1)
            frac = jnp.clip(src - s0.astype(jnp.float32), 0.0, 1.0)
            k = jnp.arange(m)[None, None, :]                     # (1, 1, M)
            wmat = ((1.0 - frac)[..., None] * (k == s0[..., None])
                    + frac[..., None] * (k == s1[..., None]))    # (S,size,M)
            inside = (p >= 0) & (p < extent[:, None])
            return wmat * inside[..., None]

        wy = axis_weights(y1, bh, oh)                            # (S, oh, M)
        wx = axis_weights(x1, bw, ow)                            # (S, ow, M)
        pasted = jnp.einsum("sym,smn,sxn->syx", wy, mask_probs, wx)
        pred = pasted * 255.0 > 122.0                            # (S, oh, ow)

        # GT: crop scaled extent, exact-rational nearest resize to (ih, iw).
        # Nearest resize = row/col selection; expressed as one-hot matmuls
        # because a 2-D pointwise XLA gather at (S, oh, ow) scale is the
        # same pathology the ROI crop had (hundreds of ms vs sub-ms MXU).
        sh = sh.astype(jnp.int32)
        sw = sw.astype(jnp.int32)
        ys = ((2 * jnp.arange(oh, dtype=jnp.int32) + 1) * sh) \
            // (2 * jnp.maximum(ih, 1))
        xs = ((2 * jnp.arange(ow, dtype=jnp.int32) + 1) * sw) \
            // (2 * jnp.maximum(iw, 1))
        ys = jnp.clip(ys, 0, gt_masks.shape[1] - 1)
        xs = jnp.clip(xs, 0, gt_masks.shape[2] - 1)
        sel_y = (jnp.arange(gt_masks.shape[1])[None, :]
                 == ys[:, None]).astype(jnp.float32)             # (oh, Hc)
        sel_x = (jnp.arange(gt_masks.shape[2])[None, :]
                 == xs[:, None]).astype(jnp.float32)             # (ow, Wc)
        g1 = jnp.einsum("yh,shw->syw", sel_y,
                        gt_masks.astype(jnp.float32))
        gt = jnp.einsum("syw,xw->syx", g1, sel_x) > 0.5          # (S, oh, ow)

        valid = ((jnp.arange(oh)[:, None] < ih)
                 & (jnp.arange(ow)[None, :] < iw))[None]
        inter = jnp.sum(pred & gt & valid, axis=(1, 2))
        union = jnp.sum((pred | gt) & valid, axis=(1, 2))
        return inter.astype(jnp.int32), union.astype(jnp.int32)

    def dispatch_image(self, params, batch: Dict[str, np.ndarray],
                       sent_valid: Optional[np.ndarray] = None) -> Dict:
        """Issue ALL device work for one image without blocking; returns a
        record that `drain` later reads back. Splitting dispatch from
        readback lets eval_split pipeline images: on the tunneled device
        here a blocking value readback costs a full round trip, and the
        un-pipelined loop paid ~2 of those per image — more than the
        actual eval compute."""
        m = self.cfg.model
        scale, sh, sw, ih, iw = self._extents(batch)
        rec = {"batch": batch, "scale": scale, "ih": ih, "iw": iw,
               "sh": sh, "sw": sw, "sent_valid": sent_valid}
        fits = self._fits(ih, iw)
        self._rng_uid += 1
        rng_uid = np.int32(self._rng_uid)

        if m.use_mask_head and self.device_paste and fits:
            # single fused dispatch; raw numpy operands (scalars included)
            # ride along with the one call
            use_bank = "gt_mask_bank" in batch
            gm = np.asarray(batch["gt_mask_bank" if use_bank
                                  else "gt_masks"])
            packed = gm.shape[-1] % 8 == 0
            images = np.asarray(batch["images"])
            ext = (self._crop_extent(sh, sw)
                   if images.dtype == np.uint8 else None)
            if ext is not None:
                # extent-crop wire: upload only the bucketed content
                # extent; a tiny device pad re-creates the loader's
                # full canvases exactly (see _crop_extent / inflate)
                hb, wb = ext
                mask_w = gm.shape[-1] // 8 if packed else gm.shape[-1]
                gm_crop = (np.packbits(gm[..., :hb, :wb] > 0, axis=-1)
                           if packed else gm[..., :hb, :wb])
                images, gm_op = self._inflate(
                    np.ascontiguousarray(images[:, :hb, :wb]), gm_crop,
                    mask_w=mask_w)
            else:
                gm_op = np.packbits(gm > 0, axis=-1) if packed else gm
            if use_bank:
                fn = (self._eval_all_bank_packed if packed
                      else self._eval_all_bank)
                mask_ops = (gm_op,
                            np.asarray(batch["mask_ref_idx"], np.int32))
            else:
                fn = self._eval_all_packed if packed else self._eval_all
                mask_ops = (gm_op,)
            sel, cls, inter, union = fn(
                params, images, batch["im_hw"], batch["labels"],
                rng_uid, *mask_ops, np.float32(scale), np.int32(sh),
                np.int32(sw), np.int32(ih), np.int32(iw))
            rec["sel"], rec["iu"] = sel, (inter, union)
            return rec

        # host-paste fallback reads batch["gt_masks"] directly
        rec["batch"] = batch = _host_expand_bank(batch)
        out = self._fwd(params, {
            "images": batch["images"], "im_hw": batch["im_hw"],
            "labels": batch["labels"], "rng_uid": rng_uid,
        })
        # one jitted dispatch selects boxes for ALL sentences (the
        # reference decodes and argmaxes per sentence on host,
        # test.py:245-259)
        sel, cls = self._select(
            out["rois"], out["bbox_pred"], out["cls_prob"],
            out["roi_valid"], np.float32(scale),
            np.float32(ih), np.float32(iw))
        rec["sel"] = sel
        if m.use_mask_head:
            # mask branch consumes the DEVICE selection — no host hop
            rec["dev_probs"] = self._mask_fwd(
                params, out["gated_conv"],
                (sel * jnp.float32(scale))[:, None, :],
                cls[:, None])[:, 0]                         # (S, 14, 14)
        return rec

    def drain(self, rec: Dict, acc: SegEvalAccumulator) -> None:
        """Read back one dispatched image's results and accumulate."""
        batch, scale = rec["batch"], rec["scale"]
        ih, iw = rec["ih"], rec["iw"]
        sent_valid = rec["sent_valid"]
        sel_boxes = np.asarray(rec["sel"])
        s = sel_boxes.shape[0]

        for i in range(s):
            if sent_valid is not None and not sent_valid[i]:
                continue
            gt_box = np.asarray(batch["gt_boxes"][i, :4]) / scale
            acc.add_detection(sel_boxes[i], gt_box)

        if "iu" in rec:
            inter = np.asarray(rec["iu"][0])
            union = np.asarray(rec["iu"][1])
            for i in range(s):
                if sent_valid is not None and not sent_valid[i]:
                    continue
                acc.add_segmentation_iu(int(inter[i]), int(union[i]))
        elif "dev_probs" in rec:
            mask_probs = np.asarray(rec["dev_probs"])
            sh, sw = rec["sh"], rec["sw"]
            for i in range(s):
                if sent_valid is not None and not sent_valid[i]:
                    continue
                gm = np.asarray(batch["gt_masks"][i])
                if self.reference_exact:
                    # reference chain bit-for-bit: bytescale+PIL-bilinear
                    # paste (mask_utils.py:43-72), > 122 cut
                    # (test.py:334), PIL-nearest GT resize (test.py:338)
                    pasted = recover_masks_ref(
                        mask_probs[i:i + 1],
                        sel_boxes[i:i + 1].copy(), ih, iw)[0]
                    pred_mask = (pasted > 122.0).astype(np.uint8)
                    gt_orig = scipy_imresize(gm[:sh, :sw], (ih, iw),
                                             "nearest")
                else:
                    pasted = recover_masks(mask_probs[i:i + 1],
                                           sel_boxes[i:i + 1].copy(),
                                           ih, iw)[0]
                    pred_mask = (pasted * 255.0 > 122.0).astype(np.uint8)
                    # canvas-sized gt: crop to the scaled extent then
                    # nearest-resize to original size (test.py:338)
                    gt_orig = nearest_resize(gm[:sh, :sw], ih, iw)
                acc.add_segmentation(pred_mask, gt_orig)

    def eval_image(self, params, batch: Dict[str, np.ndarray],
                   acc: SegEvalAccumulator,
                   sent_valid: Optional[np.ndarray] = None) -> None:
        """batch: images (1,H,W,3), im_hw (1,2), labels (S,T),
        gt_boxes (S,5) scaled, gt_masks (S,Hc,Wc), im_scale scalar.
        sent_valid: (S,) bool mask for padded sentence slots."""
        self.drain(self.dispatch_image(params, batch, sent_valid), acc)

    def eval_split(self, params, batches: Iterable[Dict[str, np.ndarray]],
                   verbose: bool = False,
                   pipeline_depth: int = 4,
                   images_per_dispatch: int = 1,
                   stage_uploads: bool = True) -> Dict[str, float]:
        """Software-pipelined eval: keep up to `pipeline_depth` dispatches
        ahead of the drain point so readbacks and host->device transfers
        overlap device compute (each blocking readback on the tunneled
        device costs a full round trip).

        images_per_dispatch > 1 additionally batches same-sentence-bucket
        images into one fused jit call (vmapped per-image eval) —
        amortizing the per-dispatch round trip, which dominates eval on
        tunneled links. Requires the device-paste path; falls back to
        per-image dispatch when unavailable.

        stage_uploads moves each chunk's host work (stack/packbits/crop)
        and host->device copies onto a one-worker staging thread with
        async `jax.device_put`, so they overlap the PREVIOUS chunks'
        device compute instead of serializing in the dispatch loop
        (chip A/B: experiments/profile_eval_put.py measured the
        put-pipelined chunk at 491 ms vs 556 ms inline; end-to-end
        delta recorded in docs/ROUND5.md). Only affects the chunked
        path; per-image dispatches are unchanged."""
        from collections import deque
        from concurrent.futures import ThreadPoolExecutor
        acc = SegEvalAccumulator()
        pending = deque()
        bi = 0
        n_batch = max(1, images_per_dispatch)
        use_chunks = (n_batch > 1 and self.cfg.model.use_mask_head
                      and self.device_paste)
        by_bucket: Dict[int, list] = {}
        staged = deque()   # stage futures not yet jit-dispatched
        pool = (ThreadPoolExecutor(max_workers=1)
                if (use_chunks and stage_uploads) else None)

        def drain_one():
            nonlocal bi
            prev = bi
            rec = pending.popleft()
            if "chunk" in rec:
                bi += self._drain_chunk(rec, acc)
            else:
                self.drain(rec, acc)
                bi += 1
            # "crossed a multiple of 20" — chunked drains advance bi in
            # steps > 1, so an == check would skip most progress lines
            if verbose and bi // 20 > prev // 20:
                s = acc.summary()
                print(f"[eval] {bi} images: det_acc={s['det_acc']:.4f} "
                      f"IoU={s['overall_iou']:.4f}")

        def valid_of(b):
            sv = b.get("sent_valid")
            return (np.ones(b["labels"].shape[0], bool) if sv is None
                    else np.asarray(sv, bool))

        def flush(bucket):
            # full groups dispatch at the requested size; PARTIAL
            # remainders split into power-of-two sub-chunks instead of
            # padding with duplicate images: padding re-ships whole
            # image copies over the (scarce) link, while pow2 splitting
            # bounds the executable set to {n_batch, ...pow2 < n_batch}
            # per bucket — every shape a run can hit is compiled during
            # the first pass over the split, never mid-stream for a
            # fresh remainder size
            group = by_bucket.pop(bucket, [])
            while group:
                take = (n_batch if len(group) >= n_batch
                        else 1 << (len(group).bit_length() - 1))
                sub, group = group[:take], group[take:]
                bs = [b for b, _ in sub]
                vs = [v for _, v in sub]
                if pool is None:
                    pending.append(self._dispatch_chunk(params, bs, vs))
                else:
                    staged.append(pool.submit(
                        self._stage_chunk, bs, vs, True))
                    # dispatch all but the newest stage so exactly one
                    # chunk's stacking+upload is always in flight behind
                    # the compute queue
                    while len(staged) > 1:
                        pending.append(self._dispatch_staged(
                            params, staged.popleft().result()))

        try:
            for batch in batches:
                if use_chunks:
                    # chunk key: sentence bucket + bank row count (bank
                    # chunks stack (n, R, Hc, Wc/8) operands, so R must
                    # be uniform within a chunk; -1 = per-sentence masks)
                    s = (batch["labels"].shape[0],
                         batch["gt_mask_bank"].shape[0]
                         if "gt_mask_bank" in batch else -1)
                    _, _, _, ih, iw = self._extents(batch)
                    if self._fits(ih, iw):
                        by_bucket.setdefault(s, []).append(
                            (batch, valid_of(batch)))
                        if len(by_bucket[s]) >= n_batch:
                            flush(s)
                    else:
                        pending.append(self.dispatch_image(
                            params, batch,
                            sent_valid=batch.get("sent_valid")))
                else:
                    pending.append(self.dispatch_image(
                        params, batch, sent_valid=batch.get("sent_valid")))
                if len(pending) >= max(1, pipeline_depth):
                    drain_one()
            for s in list(by_bucket):
                flush(s)
            while staged:
                pending.append(self._dispatch_staged(
                    params, staged.popleft().result()))
        finally:
            if pool is not None:
                pool.shutdown(wait=True)
        while pending:
            drain_one()
        return acc.summary()

    def eval_split_mesh(self, params, batches, mesh,
                        verbose: bool = False) -> Dict[str, float]:
        """Device-parallel eval: images round-robined over the mesh's
        'data' axis, one fused single-image eval per device per dispatch,
        accumulators merged on host. The last chunk pads by repeating its
        first image with all sentences masked invalid.

        Requires the mask head + device-paste path (the host-oracle
        fallback is inherently serial) and every image's original extent
        to fit the (max_orig_h, max_orig_w) buffers."""
        m = self.cfg.model
        assert m.use_mask_head and self.device_paste, \
            "mesh eval requires the device-paste path"
        n = int(np.prod(mesh.devices.shape))
        acc = SegEvalAccumulator()
        done = 0

        # multi-host: every process runs this loop over the SAME batch
        # list (the loader contract: eval batches are replicated, work
        # splits across the mesh's devices). Host operands must become
        # global arrays explicitly — jit cannot shard plain numpy over
        # devices this process cannot address.
        multi = jax.process_count() > 1
        if multi:
            from jax.sharding import NamedSharding, PartitionSpec as P
            rep_s = NamedSharding(mesh, P())
            data_s = NamedSharding(mesh, P("data"))
            params = jax.tree_util.tree_map(
                lambda x: jax.make_array_from_callback(
                    np.shape(x), rep_s,
                    lambda idx, a=np.asarray(x): a[idx]), params)

        # group by sentence-bucket size so bucketed production iterators
        # (loader.iter_test_batches(buckets=...)) work: each mesh
        # dispatch stacks one image per device and jit specializes on S.
        # Mesh chunks also stack one gm per device, so ref-deduped banks
        # (whose row counts vary per image) are expanded on host (mesh
        # eval targets real pods with local PCIe, where the per-sentence
        # upload is not the bottleneck).
        groups: Dict[int, list] = {}
        for b in batches:
            b = _host_expand_bank(b)
            groups.setdefault(b["labels"].shape[0], []).append(b)

        for s_key in sorted(groups):
            group = groups[s_key]
            for c0 in range(0, len(group), n):
                chunk = group[c0:c0 + n]
                n_real = len(chunk)
                valid_flags = []
                for b in chunk:
                    sv = b.get("sent_valid")
                    valid_flags.append(
                        np.ones(b["labels"].shape[0], bool) if sv is None
                        else np.asarray(sv, bool))
                while len(chunk) < n:                   # pad final chunk
                    chunk.append(chunk[0])
                    valid_flags.append(np.zeros_like(valid_flags[0]))

                ops, scales, s, packed, use_bank = self._stack_chunk(chunk)
                if multi:
                    ops = tuple(jax.make_array_from_callback(
                        op.shape, data_s, lambda idx, o=op: o[idx])
                        for op in ops)
                fn = self._mesh_eval_fn(mesh, packed, s)
                sel, cls, inter, union = fn(params, *ops)
                prev = done
                done += self._drain_chunk(
                    {"chunk": chunk[:n_real],
                     "valid_flags": valid_flags[:n_real],
                     "scales": scales, "sel": sel, "inter": inter,
                     "union": union}, acc)
                if verbose and done // 20 > prev // 20:
                    ss = acc.summary()
                    print(f"[eval-mesh] {done} images: "
                          f"det_acc={ss['det_acc']:.4f} "
                          f"IoU={ss['overall_iou']:.4f}")
        return acc.summary()
