"""Proposal-layer tests (reference proposal_layer.py / proposal_top_layer.py)."""

import numpy as np
import jax
import jax.numpy as jnp

from lang2seg_tpu.ops.boxes import decode_boxes, clip_boxes
from lang2seg_tpu.ops.proposals import proposal_layer, proposal_top_layer


def _anchors_scores(rng, n):
    anchors = np.stack([
        rng.uniform(0, 50, n), rng.uniform(0, 50, n),
        rng.uniform(50, 120, n), rng.uniform(50, 120, n)], axis=1)
    deltas = rng.randn(n, 4).astype(np.float32) * 0.1
    scores = rng.rand(n).astype(np.float32)
    return (jnp.asarray(anchors, jnp.float32), jnp.asarray(deltas),
            jnp.asarray(scores))


def test_proposal_top_plain_topn(rng):
    """n >= top_n: plain top-N by score, rows = decoded+clipped boxes of
    the top-scoring anchors (proposal_top_layer.py:47-62)."""
    anchors, deltas, scores = _anchors_scores(rng, 64)
    top_n = 16
    out = jax.jit(lambda s, d, a, k: proposal_top_layer(
        s, d, a, 100.0, 100.0, top_n, k))(
        scores, deltas, anchors, jax.random.PRNGKey(0))
    assert out.rois.shape == (top_n, 4)
    s = np.asarray(out.scores)
    assert (np.diff(s) <= 1e-6).all()               # descending
    order = np.argsort(-np.asarray(scores))[:top_n]
    ref = clip_boxes(decode_boxes(anchors[order], deltas[order]),
                     100.0, 100.0)
    np.testing.assert_allclose(np.asarray(out.rois), np.asarray(ref),
                               rtol=1e-5)
    assert np.asarray(out.valid).all()


def test_proposal_top_random_pad(rng):
    """n < top_n: the reference selects top_n indices uniformly at random
    WITH replacement (proposal_top_layer.py:42-45) — output must still be
    exactly top_n rows drawn from the candidate set."""
    anchors, deltas, scores = _anchors_scores(rng, 8)
    top_n = 32
    out = proposal_top_layer(scores, deltas, anchors, 100.0, 100.0,
                             top_n, jax.random.PRNGKey(1))
    assert out.rois.shape == (top_n, 4)
    assert np.asarray(out.valid).all()
    all_boxes = np.asarray(
        clip_boxes(decode_boxes(anchors, deltas), 100.0, 100.0))
    got = np.asarray(out.rois)
    for row in got:
        assert np.any(np.all(np.isclose(all_boxes, row, rtol=1e-5), axis=1))
    # with replacement over 8 candidates and 32 draws, duplicates are
    # certain (pigeonhole)
    assert len(np.unique(got, axis=0)) < top_n
    # scores travel with their boxes
    sc = np.asarray(out.scores)
    base = np.asarray(scores)
    for v in sc:
        assert np.any(np.isclose(base, v, rtol=1e-6))


def test_proposal_layer_invariants(rng):
    anchors, deltas, scores = _anchors_scores(rng, 64)
    out = jax.jit(lambda s, d, a: proposal_layer(
        s, d, a, 120.0, 110.0, 48, 12, 0.7))(scores, deltas, anchors)
    assert out.rois.shape == (12, 4)
    b = np.asarray(out.rois)
    v = np.asarray(out.valid)
    assert v.any()
    assert (b[v][:, 0] >= 0).all() and (b[v][:, 2] <= 110.0 - 1 + 1e-4).all()
    assert (b[v][:, 1] >= 0).all() and (b[v][:, 3] <= 120.0 - 1 + 1e-4).all()
    s = np.asarray(out.scores)[v]
    assert (np.diff(s) <= 1e-6).all()


def test_sorted_topk_matches_lax_top_k(rng):
    """proposal_layer's variadic-sort top-k (one lax.sort carrying the box
    coords, measured faster than top_k + gather on TPU) must select exactly
    lax.top_k's boxes — including on DUPLICATE scores, where both resolve
    ties by ascending index (lax.sort is stable)."""
    n, k = 512, 128
    scores = rng.rand(n).astype(np.float32)
    scores[100:200] = scores[50]            # forced score ties
    boxes = np.sort(rng.uniform(0, 100, (n, 2, 2)), axis=1)
    boxes = boxes.transpose(0, 2, 1).reshape(n, 4).astype(np.float32)

    s = jnp.asarray(scores)
    b = jnp.asarray(boxes)
    top_s, order = jax.lax.top_k(s, k)
    ref_boxes = np.asarray(b[order])

    out = jax.lax.sort((-s, b[:, 0], b[:, 1], b[:, 2], b[:, 3]), num_keys=1)
    got_s = -np.asarray(out[0][:k])
    got_boxes = np.stack([np.asarray(out[i][:k]) for i in range(1, 5)], -1)
    np.testing.assert_array_equal(np.asarray(top_s), got_s)
    np.testing.assert_array_equal(ref_boxes, got_boxes)
