"""RPN proposal generation (fixed-shape).

Parity: `layer_utils/proposal_layer.py:19-68` (decode deltas -> clip ->
top-K by score -> NMS -> top-N) and `layer_utils/proposal_top_layer.py`
(NMS-free top-N for TEST.MODE='top'). Outputs are padded to the static
post-NMS count with a validity mask.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from lang2seg_tpu.ops.boxes import decode_boxes, clip_boxes
from lang2seg_tpu.ops.nms import nms_padded


class Proposals(NamedTuple):
    rois: jnp.ndarray      # (post_nms_n, 4)
    scores: jnp.ndarray    # (post_nms_n,)
    valid: jnp.ndarray     # (post_nms_n,) bool


def proposal_layer(scores: jnp.ndarray, deltas: jnp.ndarray,
                   anchors: jnp.ndarray, im_h, im_w,
                   pre_nms_n: int, post_nms_n: int,
                   nms_thresh: float, nms_block: int = 128,
                   nms_impl: str = "xla", pallas_block: int = 512,
                   pallas_chunk: int = 512) -> Proposals:
    """scores: (N,) positive-class probs; deltas: (N, 4); anchors: (N, 4).
    im_h/im_w: true (unpadded) image extent for clipping.

    `nms_block` is a pure perf knob (bit-identical result for any value —
    see ops/nms.py); cfg.model.nms_block carries the chip-measured default.
    `pallas_block`/`pallas_chunk` are the pallas kernel's own tile sizes
    (cfg.model.nms_pallas_block/_chunk): the XLA kernel's tuned tile is
    256 but the pallas sweep favors 512/512 — independent knobs so each
    kernel runs at its measured best (both bit-identical for any value).

    `nms_impl` selects the NMS kernel, wire-format bit-identical either
    way: "xla" = the while_loop `nms_padded`; "pallas" = the
    VMEM-frontier Pallas kernel (ops/nms_pallas.py; TPU only — requires
    `nms_thresh` static, which it is from config); "auto" = pallas on a
    TPU backend, xla elsewhere — resolved at TRACE time via
    jax.default_backend(), so like the ops/targets.py NANGUARD knob it
    can misfire for a caller jitting onto a non-default backend; force
    "xla"/"pallas" in that situation. Chip-measured at the real in-step
    RPN distribution ((16, 12000) -> 2000): 17.0 ms -> 5.8 ms
    (experiments/bench_nms_pallas.py).

    The proposal path is non-differentiable (the reference detaches rois
    before cropping, network.py:117) — gradients must not flow from the
    ROI heads back into the RPN through box coordinates."""
    scores = jax.lax.stop_gradient(scores)
    deltas = jax.lax.stop_gradient(deltas)
    boxes = decode_boxes(anchors, deltas)
    boxes = clip_boxes(boxes, im_h, im_w)

    k = min(pre_nms_n, scores.shape[0])
    # top-k by score, carrying box coords through ONE variadic sort
    # instead of top_k + take_along_axis (measured 4.66 -> 3.84 ms at the
    # (16, 30720) -> 12000 train shape). Identical selection: lax.sort is
    # stable, so equal scores keep ascending-index order — exactly
    # lax.top_k's tie-breaking (pinned by tests/test_proposals.py::
    # test_sorted_topk_matches_lax_top_k).
    sorted_ops = jax.lax.sort(
        (-scores, boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]),
        num_keys=1)
    top_scores = -sorted_ops[0][:k]
    top_boxes = jnp.stack([sorted_ops[i][:k] for i in range(1, 5)], axis=-1)

    if nms_impl == "auto":
        nms_impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    if nms_impl == "pallas":
        from lang2seg_tpu.ops.nms_pallas import make_nms_pallas
        nms_fn = make_nms_pallas(nms_thresh, post_nms_n,
                                 block=pallas_block, chunk=pallas_chunk)
        keep_idx, keep_mask = nms_fn(top_boxes, jnp.ones((k,), dtype=bool))
    else:
        keep_idx, keep_mask = nms_padded(
            top_boxes, jnp.ones((k,), dtype=bool), nms_thresh, post_nms_n,
            block=nms_block)
    return Proposals(top_boxes[keep_idx], top_scores[keep_idx], keep_mask)


def proposal_top_layer(scores: jnp.ndarray, deltas: jnp.ndarray,
                       anchors: jnp.ndarray, im_h, im_w,
                       top_n: int, key) -> Proposals:
    """NMS-free variant (proposal_top_layer.py:18-67): plain top-N by
    score; when there are fewer anchors than top_n the reference instead
    selects top_n indices uniformly at random WITH replacement
    (proposal_top_layer.py:42-45) — anchor count is static under jit, so
    the branch resolves at trace time. Always returns exactly top_n rows.
    """
    n = scores.shape[0]
    if n < top_n:
        order = jax.random.randint(key, (top_n,), 0, n)
        top_scores = scores[order]
    else:
        top_scores, order = jax.lax.top_k(scores, top_n)
    boxes = decode_boxes(anchors[order], deltas[order])
    boxes = clip_boxes(boxes, im_h, im_w)
    valid = jnp.ones((top_n,), dtype=bool)
    return Proposals(boxes, top_scores, valid)
