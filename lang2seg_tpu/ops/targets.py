"""RPN anchor targets and ROI proposal targets as fixed-shape jit ops.

The reference runs these on the host in NumPy mid-forward
(`layer_utils/anchor_target_layer.py:19-153`,
`layer_utils/proposal_target_layer.py:22-204`), crossing the host/device
boundary twice per step. Here they are pure jit-able functions: dynamic
candidate sets become validity masks, `npr.choice` subsampling becomes
random-priority top-k (exactly uniform without replacement), and the
per-ROI scipy mask-resize loop becomes a batched nearest-neighbor gather.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

import os

from lang2seg_tpu.ops.boxes import box_iou, encode_boxes
from lang2seg_tpu.ops.roi_align import roi_nearest_crop

_BIG = 1e9

# Workaround for a fused gather+log miscompile observed on the axon-jaxlib
# CPU backend (NaN at strided lanes for provably finite inputs; isolated
# execution is exact — docs/DESIGN.md). encode_boxes clamps extents at the
# source, so targets are finite by construction and this guard cannot hide
# a genuine NaN — it only neutralizes the miscompile. Default: enabled on
# the CPU backend where the miscompile lives, DISABLED on TPU (a future
# edit that reintroduced NaNs there would surface instead of being zeroed).
# Force with LANG2SEG_NANGUARD=0 (off) / any other value (on; matches the
# historical "anything except 0 enables" contract); unset = auto.
# tests/test_targets.py asserts finite with it off.
_env = os.environ.get("LANG2SEG_NANGUARD")
_NANGUARD = "auto" if _env is None else _env != "0"


def _guard(x):
    on = _NANGUARD
    if on == "auto":
        # auto keys off the process's default backend at trace time; a
        # caller explicitly jitting targets onto CPU from a TPU-default
        # process would dodge the guard — force LANG2SEG_NANGUARD=1
        # in that (out-of-tree) configuration
        on = jax.default_backend() == "cpu"
    return jnp.nan_to_num(x, nan=0.0, posinf=0.0, neginf=0.0) if on else x


class AnchorTargets(NamedTuple):
    labels: jnp.ndarray            # (N,) int32 in {-1, 0, 1}
    bbox_targets: jnp.ndarray      # (N, 4)
    bbox_inside_w: jnp.ndarray     # (N,) 0/1
    bbox_outside_w: jnp.ndarray    # (N,) per-anchor weight


def anchor_targets(anchors: jnp.ndarray, gt_boxes: jnp.ndarray,
                   gt_valid: jnp.ndarray, im_h, im_w, key,
                   rpn_batchsize: int = 256, fg_fraction: float = 0.5,
                   pos_overlap: float = 0.7, neg_overlap: float = 0.3,
                   clobber_positives: bool = False) -> AnchorTargets:
    """RPN training targets.

    anchors: (N, 4); gt_boxes: (M, 5) [x1 y1 x2 y2 cls]; gt_valid: (M,) bool;
    im_h/im_w: scalar true image extent (anchors outside are don't-care).
    Parity: anchor_target_layer.py:19-153 with border=0.
    """
    n = anchors.shape[0]
    inside = ((anchors[:, 0] >= 0) & (anchors[:, 1] >= 0)
              & (anchors[:, 2] < im_w) & (anchors[:, 3] < im_h))

    iou = box_iou(anchors, gt_boxes[:, :4])               # (N, M)
    iou = jnp.where(gt_valid[None, :], iou, -1.0)
    iou = jnp.where(inside[:, None], iou, -1.0)
    argmax_gt = jnp.argmax(iou, axis=1)                   # (N,)
    max_iou = jnp.max(iou, axis=1)                        # (N,)

    # per-gt best anchors: any anchor matching the column max (ties included,
    # matching np.where(overlaps == gt_max) in the reference)
    gt_max = jnp.max(iou, axis=0)                         # (M,)
    is_gt_best = jnp.any((iou == gt_max[None, :]) & gt_valid[None, :]
                         & (gt_max[None, :] > -1.0), axis=1) & inside

    neg = inside & (max_iou < neg_overlap)
    pos = inside & (is_gt_best | (max_iou >= pos_overlap))
    if clobber_positives:
        pos = pos & ~(max_iou < neg_overlap)
    else:
        neg = neg & ~pos

    # subsample positives to num_fg, negatives to batch - num_pos_kept.
    # Uniform-without-replacement via random-priority selection: each
    # class keeps its budget-many smallest uniform draws. Rather than a
    # full N-wide argsort + N-wide rank scatter (the round-3 fused-sort
    # formulation; ~24 ms in-step at (16, 30720) by removal A/B), take
    # each class's budget-many smallest keys with lax.top_k (budget <=
    # 256 << N) and scatter just those indices. The selected SET is
    # bit-identical to the rank formulation whenever the draws are
    # distinct (oracle: tests/test_targets.py::
    # test_fused_subsample_matches_two_pass); on a tied pair straddling the
    # budget boundary (float32 draws have 24 random bits, so ties do
    # occur) top_k and argsort merely break the tie differently — both
    # pick one of the tied anchors arbitrarily, same distribution.
    k_pos, k_neg = jax.random.split(key)
    num_fg = int(fg_fraction * rpn_batchsize)
    sent = jnp.int32(0x7FFFFFFF)
    bits_pos = jax.lax.bitcast_convert_type(
        jax.random.uniform(k_pos, pos.shape), jnp.int32)
    bits_neg = jax.lax.bitcast_convert_type(
        jax.random.uniform(k_neg, neg.shape), jnp.int32)
    key_pos = jnp.where(pos, bits_pos, sent)
    key_neg = jnp.where(neg, bits_neg, sent)

    n_pos = jnp.sum(pos)
    num_pos_kept = jnp.minimum(n_pos, num_fg)
    num_bg = rpn_batchsize - num_pos_kept

    # top_k of the negated keys = the k smallest keys, sorted ascending;
    # slots past the class count land on sentinel entries and are masked
    # both by slot rank and by the returned value.
    kp = min(num_fg, n)          # tiny configs: budget can exceed N
    kn = min(rpn_batchsize, n)
    vp, ip = jax.lax.top_k(-key_pos, kp)
    vn, in_ = jax.lax.top_k(-key_neg, kn)
    keep_p = (jnp.arange(kp) < num_pos_kept) & (vp != -sent)
    keep_n = (jnp.arange(kn) < num_bg) & (vn != -sent)
    # top_k indices are distinct positions, so .set is scatter-safe
    pos_kept = jnp.zeros_like(pos).at[ip].set(keep_p)
    neg_kept = jnp.zeros_like(neg).at[in_].set(keep_n)

    labels = jnp.where(pos_kept, 1, jnp.where(neg_kept, 0, -1)).astype(jnp.int32)

    # matched-GT coordinates via one-hot matmul, NOT gt_boxes[argmax_gt]:
    # the (N,)-indexed row gather from the tiny (M, 5) table lowers
    # pathologically on this TPU (+15.5 ms at (16, 30720, 8) by stage
    # bisection, experiments/profile_anchor_targets.py) — same pathology
    # class as the ROI crop / mask-target gathers. One selected row per
    # anchor, so the f32 matmul is exact, not approximate.
    # precision=HIGHEST: TPU f32 matmuls default to bf16 passes, which
    # would silently ROUND the selected coordinates (CPU tests wouldn't
    # catch it); highest-precision f32 is exact for a {0,1} row select.
    onehot = (argmax_gt[:, None] == jnp.arange(gt_boxes.shape[0])[None, :]
              ).astype(jnp.float32)                    # (N, M)
    matched = jnp.matmul(onehot, gt_boxes[:, :4],
                         precision=jax.lax.Precision.HIGHEST)  # (N, 4)
    tgt = _guard(encode_boxes(anchors, matched))
    tgt = jnp.where(inside[:, None], tgt, 0.0)

    inside_w = (labels == 1).astype(jnp.float32)
    num_examples = jnp.sum(labels >= 0).astype(jnp.float32)
    outside_w = (labels >= 0).astype(jnp.float32) / jnp.maximum(num_examples, 1.0)

    return AnchorTargets(labels, tgt, inside_w, outside_w)


class ProposalTargets(NamedTuple):
    rois: jnp.ndarray              # (R, 4) sampled rois [x1 y1 x2 y2]
    labels: jnp.ndarray            # (R,) int32 class (0 = bg)
    bbox_targets: jnp.ndarray      # (R, 4) compact per-roi deltas
    bbox_weight: jnp.ndarray       # (R,) 1.0 for fg rois
    mask_targets: jnp.ndarray      # (Fg_slots, S, S) float32 {0,1}
    mask_weight: jnp.ndarray       # (Fg_slots,) 1.0 for true-fg slots
    roi_valid: jnp.ndarray         # (R,) bool


def proposal_targets(rois: jnp.ndarray, roi_valid: jnp.ndarray,
                     gt_boxes: jnp.ndarray, gt_valid: jnp.ndarray,
                     gt_masks: jnp.ndarray, key,
                     num_rois: int = 256, fg_fraction: float = 0.25,
                     fg_thresh: float = 0.5, bg_thresh_hi: float = 0.5,
                     bg_thresh_lo: float = 0.0, mask_size: int = 14,
                     normalize_means=(0., 0., 0., 0.),
                     normalize_stds=(0.1, 0.1, 0.2, 0.2),
                     use_gt: bool = False) -> ProposalTargets:
    """Sample ROIs + build classification/regression/mask targets.

    rois: (P, 4) proposals; gt_boxes: (M, 5); gt_masks: (M, H, W) {0,1}.
    Output layout: fg slots first (0..num_fg_slots-1), then bg — matching
    the reference's fg-then-bg concatenation so the mask head can run on
    the leading slots only. Parity: proposal_target_layer.py:22-204 with
    the no-fg GT-append fallback expressed as a mask (GT candidates enabled
    iff use_gt or no proposal reaches fg_thresh).
    """
    num_fg_slots = int(round(fg_fraction * num_rois))
    p = rois.shape[0]
    m = gt_boxes.shape[0]

    # candidate set = proposals ++ gt boxes
    cand = jnp.concatenate([rois, gt_boxes[:, :4]], axis=0)     # (P+M, 4)
    is_gt = jnp.arange(p + m) >= p

    iou = box_iou(cand, gt_boxes[:, :4])
    iou = jnp.where(gt_valid[None, :], iou, -1.0)
    max_iou = jnp.max(iou, axis=1)
    gt_assign = jnp.argmax(iou, axis=1)
    cand_valid = jnp.concatenate([roi_valid, gt_valid], axis=0)

    fg = cand_valid & (max_iou >= fg_thresh)
    bg = cand_valid & (max_iou < bg_thresh_hi) & (max_iou >= bg_thresh_lo) & ~is_gt

    # GT candidates participate only if use_gt, or as the no-fg fallback
    prop_fg = fg & ~is_gt
    any_prop_fg = jnp.any(prop_fg)
    if not use_gt:
        fg = jnp.where(is_gt, fg & ~any_prop_fg, fg)

    fg_count = jnp.sum(fg)
    bg_count = jnp.sum(bg)

    k_fg, k_bg, k_rep = jax.random.split(key, 3)
    # index of the candidate holding fg-rank r (random order over fg):
    # argsort over the masked random priorities puts the True elements
    # first in a uniformly-random order, directly giving the by-rank
    # gather order with one sort (no inverse-permutation scatter).
    fg_by_rank = jnp.argsort(
        jax.random.uniform(k_fg, fg.shape) + (~fg) * _BIG)
    bg_by_rank = jnp.argsort(
        jax.random.uniform(k_bg, bg.shape) + (~bg) * _BIG)

    # how many fg slots are real fg: min(num_fg_slots, fg_count); when there
    # are no bg candidates the reference fills all slots with fg sampled with
    # replacement — approximate by repeating fg candidates cyclically.
    all_fg = (bg_count == 0) & (fg_count > 0)
    fg_take = jnp.where(all_fg, num_rois, jnp.minimum(num_fg_slots, fg_count))

    slot = jnp.arange(num_rois)
    is_fg_slot = slot < fg_take

    safe_fg = jnp.maximum(fg_count, 1)
    safe_bg = jnp.maximum(bg_count, 1)
    # Gather discipline: every vmapped advanced-index gather costs ~1.7 ms
    # at the flagship (E=16) shape on this TPU regardless of output size
    # (experiments/profile_anchor_targets.py + the in-step removal A/B),
    # so the sampling below folds what used to be nine gathers into three:
    # the two bg index sources resolve BEFORE the bg-rank gather, the four
    # same-index candidate gathers ride one packed payload row, and the
    # tiny (M, 5) GT-table lookups become an exact one-hot matmul.
    # fg slots draw without replacement while slot < fg_count, then cycle
    fg_src = fg_by_rank[jnp.mod(slot, safe_fg)]
    # bg slots: without replacement if enough bg, else uniform with
    # replacement — choose the index per slot first, gather once
    bg_pos = slot - fg_take
    bg_rand = jax.random.randint(k_rep, (num_rois,), 0, safe_bg)
    need_bg = num_rois - fg_take
    bg_idx = jnp.where(bg_count >= need_bg,
                       jnp.clip(bg_pos, 0, p + m - 1) % safe_bg, bg_rand)
    bg_src = bg_by_rank[bg_idx]

    sel = jnp.where(is_fg_slot, fg_src, bg_src)              # (R,) candidate idx

    # one gather for [cand | fg | bg | gt_assign] (int/bool exact in f32)
    payload = jnp.concatenate([
        cand, fg[:, None].astype(jnp.float32), bg[:, None].astype(jnp.float32),
        gt_assign[:, None].astype(jnp.float32)], axis=1)     # (P+M, 7)
    row = payload[sel]                                       # (R, 7)
    out_rois = row[:, :4]
    out_valid = jnp.where(is_fg_slot, row[:, 4] > 0.5, row[:, 5] > 0.5)
    gt_idx = row[:, 6].astype(jnp.int32)

    # matched GT rows via exact one-hot matmul (HIGHEST: TPU f32 matmul
    # defaults to bf16 passes which would round the coordinates)
    oh = (gt_idx[:, None] == jnp.arange(m)[None, :]).astype(jnp.float32)
    matched_gt = jnp.matmul(oh, gt_boxes,
                            precision=jax.lax.Precision.HIGHEST)  # (R, 5)
    labels = jnp.where(is_fg_slot & out_valid,
                       matched_gt[:, 4].astype(jnp.int32), 0)

    # compact bbox regression targets (expanded-by-class only at the loss,
    # which is mathematically identical to the reference's (R, 4K) layout)
    tgt = _guard(encode_boxes(out_rois, matched_gt[:, :4]))
    means = jnp.asarray(normalize_means, dtype=tgt.dtype)
    stds = jnp.asarray(normalize_stds, dtype=tgt.dtype)
    tgt = (tgt - means) / stds
    bbox_w = (labels > 0).astype(jnp.float32)
    tgt = tgt * bbox_w[:, None]

    # mask targets for the fg slots. Gather POINTS directly from the
    # (M, H, W) uint8 stack — materializing gt_masks[fg_gt] would copy
    # num_fg_slots full-canvas masks (gigabytes at batch scale).
    fg_rois = out_rois[:num_fg_slots]
    fg_gt = gt_idx[:num_fg_slots]

    s = mask_size
    x1 = jnp.floor(fg_rois[:, 0]).astype(jnp.int32)
    y1 = jnp.floor(fg_rois[:, 1]).astype(jnp.int32)
    x2 = jnp.floor(fg_rois[:, 2]).astype(jnp.int32)
    y2 = jnp.floor(fg_rois[:, 3]).astype(jnp.int32)
    t2 = 2 * jnp.arange(s, dtype=jnp.int32) + 1
    ys = y1[:, None] + (t2[None, :] * (y2 - y1 + 1)[:, None]) // (2 * s)
    xs = x1[:, None] + (t2[None, :] * (x2 - x1 + 1)[:, None]) // (2 * s)
    mh, mw = gt_masks.shape[1], gt_masks.shape[2]
    ys = jnp.clip(ys, 0, mh - 1)
    xs = jnp.clip(xs, 0, mw - 1)
    # nearest point selection expressed as exact one-hot matmuls — the
    # 3-D advanced-index gather gt_masks[fg_gt, ys, xs] lowers
    # pathologically on this TPU (~58 ms standalone at flagship shapes
    # vs ~1 ms for the contraction; same pathology class the ROI crop
    # had). Row-select each fg slot's GT mask rows, then column-select:
    # all values stay in {0, 1}, exact in f32.
    sel_m = (fg_gt[:, None] == jnp.arange(gt_masks.shape[0])[None, :]
             ).astype(jnp.float32)                          # (F, M)
    sel_y = (ys[:, :, None] == jnp.arange(mh)[None, None, :]
             ).astype(jnp.float32)                          # (F, S, H)
    sel_x = (xs[:, :, None] == jnp.arange(mw)[None, None, :]
             ).astype(jnp.float32)                          # (F, S, W)
    gmf = gt_masks.astype(jnp.float32)                      # (M, H, W)
    # contract H before M so the intermediate is (F, S, M, W) (a few MB)
    # rather than a per-slot full-canvas (F, H, W) copy (hundreds of MB)
    rows = jnp.einsum("fsh,mhw->fsmw", sel_y, gmf)
    rows = jnp.einsum("fm,fsmw->fsw", sel_m, rows)           # (F, S, W)
    mask_t = jnp.einsum("fsw,ftw->fst", rows, sel_x)         # (F, S, S)
    mask_w = (is_fg_slot[:num_fg_slots] & out_valid[:num_fg_slots]).astype(jnp.float32)

    return ProposalTargets(out_rois, labels, tgt, bbox_w, mask_t, mask_w,
                           out_valid)
