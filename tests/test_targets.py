"""Structural/semantic tests for anchor and proposal target assignment,
checked against the reference algorithm's invariants (counts, thresholds,
label semantics) rather than exact RNG draws."""

import numpy as np
import jax
import jax.numpy as jnp

from lang2seg_tpu.ops.anchors import shifted_anchors
from lang2seg_tpu.ops.boxes import box_iou
from lang2seg_tpu.ops.targets import anchor_targets, proposal_targets


def make_scene():
    anchors = shifted_anchors(10, 16, 16, (4, 8, 16, 32), (0.5, 1, 2))
    gt = jnp.asarray([[20.0, 20.0, 90.0, 120.0, 5.0],
                      [100.0, 30.0, 200.0, 140.0, 17.0],
                      [0.0, 0.0, 0.0, 0.0, 0.0]], jnp.float32)
    gt_valid = jnp.asarray([True, True, False])
    return anchors, gt, gt_valid


def test_anchor_targets_invariants():
    anchors, gt, gt_valid = make_scene()
    key = jax.random.PRNGKey(0)
    out = anchor_targets(anchors, gt, gt_valid, 160.0, 256.0, key)
    labels = np.asarray(out.labels)

    # batch size respected: pos <= 128, pos + neg == min(256, eligible)
    # (when fewer candidates exist than the batch, all are kept — reference
    # subsamples only when over budget)
    a = np.asarray(anchors)
    inside_m = ((a[:, 0] >= 0) & (a[:, 1] >= 0)
                & (a[:, 2] < 256) & (a[:, 3] < 160))
    iou_all = np.asarray(box_iou(anchors, gt[:, :4]))[:, :2]
    eligible_neg = (inside_m & (iou_all.max(1) < 0.3)).sum()
    assert (labels == 1).sum() <= 128
    n_pos = (labels == 1).sum()
    assert (labels >= 0).sum() == min(256, n_pos + eligible_neg)

    # every positive either >= 0.7 IoU or is a per-gt argmax anchor
    iou = np.asarray(box_iou(anchors, gt[:, :4]))[:, :2]
    pos_idx = np.where(labels == 1)[0]
    gt_best = set()
    for j in range(2):
        m = iou[:, j].max()
        gt_best.update(np.where(iou[:, j] == m)[0].tolist())
    for i in pos_idx:
        assert iou[i].max() >= 0.7 or i in gt_best

    # negatives are < 0.3 IoU
    neg_idx = np.where(labels == 0)[0]
    assert (iou[neg_idx].max(axis=1) < 0.3).all()

    # anchors outside the image are don't-care
    a = np.asarray(anchors)
    outside = ~((a[:, 0] >= 0) & (a[:, 1] >= 0)
                & (a[:, 2] < 256) & (a[:, 3] < 160))
    assert (labels[outside] == -1).all()

    # inside weights only on positives; outside weights uniform over examples
    in_w = np.asarray(out.bbox_inside_w)
    assert set(np.where(in_w > 0)[0]) == set(pos_idx)
    out_w = np.asarray(out.bbox_outside_w)
    n_examples = (labels >= 0).sum()
    np.testing.assert_allclose(out_w[labels >= 0], 1.0 / n_examples,
                               rtol=1e-5)


def test_anchor_targets_regression_points_at_argmax_gt():
    anchors, gt, gt_valid = make_scene()
    out = anchor_targets(anchors, gt, gt_valid, 160.0, 256.0,
                         jax.random.PRNGKey(1))
    labels = np.asarray(out.labels)
    iou = np.asarray(box_iou(anchors, gt[:, :4]))[:, :2]
    from lang2seg_tpu.ops.boxes import encode_boxes
    for i in np.where(labels == 1)[0][:10]:
        j = int(iou[i].argmax())
        expect = np.asarray(encode_boxes(anchors[i:i + 1], gt[j:j + 1, :4]))[0]
        np.testing.assert_allclose(np.asarray(out.bbox_targets)[i], expect,
                                   rtol=1e-4, atol=1e-5)


def _proposal_scene(rng, num_props=200):
    gt = jnp.asarray([[30.0, 30.0, 100.0, 110.0, 7.0],
                      [0.0, 0.0, 0.0, 0.0, 0.0]], jnp.float32)
    gt_valid = jnp.asarray([True, False])
    masks = np.zeros((2, 160, 256), np.uint8)
    masks[0, 30:111, 30:101] = 1
    # proposals: half near the gt, half background
    near = np.array([30, 30, 100, 110], np.float32)[None, :] \
        + rng.uniform(-12, 12, (num_props // 2, 4)).astype(np.float32)
    far = rng.uniform(120, 250, (num_props // 2, 4)).astype(np.float32)
    far[:, 2:] = far[:, :2] + rng.uniform(5, 30, (num_props // 2, 2))
    props = jnp.asarray(np.concatenate([near, far], 0))
    return props, gt, gt_valid, jnp.asarray(masks)


def test_proposal_targets_invariants(rng):
    props, gt, gt_valid, masks = _proposal_scene(rng)
    out = proposal_targets(props, jnp.ones((200,), bool), gt, gt_valid,
                           masks, jax.random.PRNGKey(0))
    labels = np.asarray(out.labels)
    rois = np.asarray(out.rois)
    assert rois.shape == (256, 4)

    # fg-first layout; fg labeled with gt class 7, bg labeled 0
    fg = labels > 0
    assert fg.sum() <= 64
    assert set(labels[fg]) == {7}
    assert (np.where(fg)[0] < 64).all()

    # all fg rois overlap gt >= 0.5; valid bg < 0.5
    iou = np.asarray(box_iou(jnp.asarray(rois), gt[:1, :4]))[:, 0]
    assert (iou[fg] >= 0.5).all()
    valid = np.asarray(out.roi_valid)
    bg = valid & ~fg
    assert (iou[bg] < 0.5).all()

    # mask targets binary, weighted only on true fg slots
    mt = np.asarray(out.mask_targets)
    assert mt.shape == (64, 14, 14)
    assert set(np.unique(mt)) <= {0.0, 1.0}
    mw = np.asarray(out.mask_weight)
    assert (mw[:fg.sum()] == 1).all() and (mw[fg.sum():] == 0).all()

    # bbox weights on fg only
    bw = np.asarray(out.bbox_weight)
    np.testing.assert_array_equal(bw > 0, fg)


def test_proposal_targets_gt_fallback(rng):
    # no proposal reaches fg_thresh -> gt box must be injected as the fg
    gt = jnp.asarray([[30.0, 30.0, 100.0, 110.0, 7.0]], jnp.float32)
    gt_valid = jnp.asarray([True])
    masks = jnp.asarray(np.ones((1, 160, 256), np.uint8))
    far = rng.uniform(150, 250, (50, 4)).astype(np.float32)
    far[:, 2:] = far[:, :2] + 10
    out = proposal_targets(jnp.asarray(far), jnp.ones((50,), bool),
                           gt, gt_valid, masks, jax.random.PRNGKey(0))
    labels = np.asarray(out.labels)
    assert (labels > 0).sum() == 1
    np.testing.assert_allclose(np.asarray(out.rois)[0], [30, 30, 100, 110])


def test_proposal_targets_mask_crop_correct(rng):
    props, gt, gt_valid, masks = _proposal_scene(rng)
    out = proposal_targets(props, jnp.ones((200,), bool), gt, gt_valid,
                           masks, jax.random.PRNGKey(2))
    # oracle-crop the first fg roi
    from tests.test_roi_align import nearest_oracle
    roi = np.asarray(out.rois)[0]
    x1, y1, x2, y2 = int(roi[0]), int(roi[1]), int(roi[2]), int(roi[3])
    m = np.asarray(masks)[0]
    cropped = m[y1:y2 + 1, x1:x2 + 1]
    if x1 >= 0 and y1 >= 0:
        np.testing.assert_array_equal(np.asarray(out.mask_targets)[0],
                                      nearest_oracle(cropped))


def test_targets_finite_without_nanguard(monkeypatch):
    """With the miscompile guard disabled, degenerate/padded GT boxes must
    still encode to finite targets (encode_boxes clamps extents at the
    source) — so the guard cannot be hiding genuine NaNs (VERDICT r1 #9)."""
    from lang2seg_tpu.ops import targets as T
    monkeypatch.setattr(T, "_NANGUARD", False)
    anchors, gt, gt_valid = make_scene()
    # degenerate box (x2 < x1, y2 < y1) marked valid: worst case
    gt = gt.at[2].set(jnp.asarray([50.0, 50.0, 10.0, 20.0, 3.0]))
    gt_valid = jnp.asarray([True, True, True])
    key = jax.random.PRNGKey(7)
    at = T.anchor_targets(anchors, gt, gt_valid, 160.0, 256.0, key)
    assert np.isfinite(np.asarray(at.bbox_targets)).all()

    rois = jnp.asarray([[0.0, 0.0, 0.0, 0.0],
                        [30.0, 30.0, 80.0, 110.0],
                        [90.0, 25.0, 210.0, 150.0],
                        [55.0, 55.0, 5.0, 15.0]], jnp.float32)  # degenerate
    pt = T.proposal_targets(rois, jnp.asarray([True, True, True, True]),
                            gt, gt_valid,
                            jnp.zeros((3, 160, 256), jnp.uint8),
                            key, num_rois=8)
    assert np.isfinite(np.asarray(pt.bbox_targets)).all()


def test_proposal_targets_all_fg_cyclic_fill(rng):
    """Distribution pin for the documented deviation from the reference:
    when every candidate is fg (no bg at all), proposal_target_layer.py
    samples the R slots from the fg set uniformly WITH replacement
    (npr.choice); we fill cyclically over a randomly-ordered fg set.
    Marginals match (each fg expected R/F times); the deviation is the
    joint (counts are floor/ceil(R/F) exactly instead of multinomial).
    This test pins that contract: all slots fg, per-candidate counts in
    {floor, ceil}, random order keyed by `key`."""
    gt = jnp.asarray([[20.0, 20.0, 120.0, 120.0, 5.0]], jnp.float32)
    gt_valid = jnp.asarray([True])
    masks = jnp.asarray(np.ones((1, 160, 256), np.uint8))
    # 6 proposals, all overlapping gt >= 0.5 -> fg; no bg anywhere
    props = np.asarray([[20, 20, 120, 120],
                        [25, 22, 118, 119],
                        [18, 25, 122, 115],
                        [22, 18, 119, 121],
                        [24, 24, 116, 116],
                        [19, 21, 121, 118]], np.float32)
    out = proposal_targets(jnp.asarray(props), jnp.ones((6,), bool),
                           gt, gt_valid, masks, jax.random.PRNGKey(3),
                           num_rois=16)
    labels = np.asarray(out.labels)
    valid = np.asarray(out.roi_valid)
    assert valid.all()
    assert (labels == 5).all()          # every slot is a real fg
    rois = np.asarray(out.rois)
    # count appearances of each fg candidate (P+M candidates incl. the
    # appended gt box, which duplicates props[0] here)
    cands = np.concatenate([props, np.asarray(gt)[:, :4]], 0)
    counts = np.zeros(len(cands), int)
    for r in rois:
        d = np.abs(cands - r[None]).sum(1)
        counts[np.argmin(d)] += 1
    # gt candidate only participates via fallback when no prop fg exists;
    # here prop fg exists, so 6 active candidates over 16 slots
    active = counts[counts > 0]
    assert counts.sum() == 16
    lo, hi = 16 // 6, -(-16 // 6)
    assert all(c in (lo, hi) for c in active), counts


def test_fused_subsample_matches_two_pass():
    """The one-sort composite-key subsampler in anchor_targets selects
    EXACTLY the anchors the original two-pass rank subsampler selected
    (the fused sort orders within-class by the same uniform draws, so the
    kept sets are bit-identical, not just distributionally equal)."""
    anchors, gt, gt_valid = make_scene()

    def two_pass_labels(key):
        # verbatim oracle: the pre-fusion implementation
        a = anchors
        inside = ((a[:, 0] >= 0) & (a[:, 1] >= 0)
                  & (a[:, 2] < 256) & (a[:, 3] < 160))
        iou = box_iou(a, gt[:, :4])
        iou = jnp.where(gt_valid[None, :], iou, -1.0)
        iou = jnp.where(inside[:, None], iou, -1.0)
        max_iou = jnp.max(iou, axis=1)
        gt_max = jnp.max(iou, axis=0)
        is_gt_best = jnp.any((iou == gt_max[None, :]) & gt_valid[None, :]
                             & (gt_max[None, :] > -1.0), axis=1) & inside
        neg = inside & (max_iou < 0.3)
        pos = inside & (is_gt_best | (max_iou >= 0.7))
        neg = neg & ~pos

        def random_rank(k, mask):
            prio = jax.random.uniform(k, mask.shape) + (~mask) * 1e9
            order = jnp.argsort(prio)
            return jnp.zeros_like(order).at[order].set(
                jnp.arange(mask.shape[0]))

        k_pos, k_neg = jax.random.split(key)
        pos_rank = random_rank(k_pos, pos)
        pos_kept = pos & (pos_rank < 128)
        num_bg = 256 - jnp.sum(pos_kept)
        neg_kept = neg & (random_rank(k_neg, neg) < num_bg)
        return np.asarray(
            jnp.where(pos_kept, 1, jnp.where(neg_kept, 0, -1)))

    for seed in range(8):
        key = jax.random.PRNGKey(seed)
        got = np.asarray(
            anchor_targets(anchors, gt, gt_valid, 160.0, 256.0, key).labels)
        np.testing.assert_array_equal(got, two_pass_labels(key))
