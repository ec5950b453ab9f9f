"""Lang2Seg: the full language-conditioned Mask R-CNN, as one config-driven
flax module.

The reference implements each loss-set variant as a separate ~800-line
Network copy (network.py / network_7f.py / network_7f_response.py /
network_cycle_res5_2.py / network_cycle_response.py / network_vgg.py); here
a single model is parameterized by `ModelConfig`: `num_filters` (1|7),
`response_gate`, and the loss set {det, mask, response, caption}.

Batching design (the TPU-native departure): the reference runs ONE sentence
per forward and re-runs the ResNet head on the full image for every
sentence of the image (train_val.py:350, network.py:659). Here the batch
axis is expressions; unique images run through the backbone once and
expressions index into them (`img_idx`), so backbone cost is amortized
E/I-fold and every stage is a single jit region with fixed shapes.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from lang2seg_tpu.config import Config
from lang2seg_tpu.models.resnet import ResNetC4
from lang2seg_tpu.models.lang_encoder import RNNEncoder
from lang2seg_tpu.models.dynamic_filter import DynamicFilterGen
from lang2seg_tpu.models.heads import RPNHead, BoxHead, MaskHead
from lang2seg_tpu.ops.anchors import shifted_anchors
from lang2seg_tpu.ops.proposals import (proposal_layer, proposal_top_layer,
                                        Proposals)
from lang2seg_tpu.ops.roi_align import roi_crop_pool
from lang2seg_tpu.ops.targets import anchor_targets, proposal_targets


def smooth_l1(pred, target, inside_w, outside_w, sigma: float):
    """Reference _smooth_l1_loss (network.py:357-370): per-element huber on
    inside-weighted diffs, scaled by outside weights. Caller reduces.

    Masking uses `where` (not multiplication) so masked-out entries that
    are inf (e.g. overflowed activations early in scratch training) cannot
    poison the loss via 0 * inf = NaN."""
    s2 = sigma * sigma
    diff = jnp.where(inside_w > 0, pred - target, 0.0) * inside_w
    a = jnp.abs(diff)
    flag = (a < 1.0 / s2).astype(pred.dtype)
    per = flag * 0.5 * s2 * diff * diff + (1.0 - flag) * (a - 0.5 / s2)
    return jnp.where(outside_w > 0, per * outside_w, 0.0)


def weighted_softmax_ce(logits, labels, weights):
    """mean of CE over entries with weight>0 (sum w * ce / sum w)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    ce = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    ce = jnp.where(weights > 0, ce, 0.0)
    denom = jnp.maximum(jnp.sum(weights), 1.0)
    return jnp.sum(ce * weights) / denom


def response_target(gt_mask: jnp.ndarray, stride: int,
                    h: int, w: int) -> jnp.ndarray:
    """Nearest-downsample a (canvas_h, canvas_w) GT mask to the (h, w)
    response map by stride-center sampling: cell k reads canvas pixel
    stride*k + stride//2.

    The reference nearest-resizes the scaled-image-sized mask to the
    exact response-map size through scipy imresize / PIL NEAREST
    (network_7f_response.py:415), whose accumulated-float indexing
    picks int((k+0.5)*ih/h_map) — identical to stride-center sampling
    whenever the image extent is an exact stride multiple and drifting
    by at most stride//2 source pixels on the final cells otherwise.
    The agreement is pinned against a scipy-semantics oracle in
    tests/test_ref_exact.py::test_response_target_vs_scipy_oracle."""
    gm = gt_mask.astype(jnp.float32)
    return gm[stride // 2::stride, stride // 2::stride][:h, :w]


def bce_with_logits(logits, targets):
    return jnp.maximum(logits, 0) - logits * targets + jnp.log1p(
        jnp.exp(-jnp.abs(logits)))


class Lang2Seg(nn.Module):
    """See module docstring. Construct with a full `Config`."""
    cfg: Config

    def setup(self):
        m = self.cfg.model
        dtype = jnp.bfloat16 if m.compute_dtype == "bfloat16" else jnp.float32
        if m.backbone.startswith("resnet"):
            self.backbone = ResNetC4(depth=m.backbone, dtype=dtype,
                                     tail_matmul=m.tail_matmul,
                                     tail_mosaic=m.tail_mosaic,
                                     head_s2d=m.head_s2d)
        elif m.backbone == "mobilenet_v1":
            from lang2seg_tpu.models.mobilenet import MobileNetV1
            self.backbone = MobileNetV1(dtype=dtype)
        else:
            from lang2seg_tpu.models.vgg import VGG16
            self.backbone = VGG16(dtype=dtype)
        if m.use_language:
            self.encoder = RNNEncoder(
                vocab_size=m.vocab_size,
                word_embedding_size=m.word_embedding_size,
                word_vec_size=m.word_vec_size,
                hidden_size=m.rnn_hidden_size,
                bidirectional=m.bidirectional,
                input_dropout_p=m.word_drop_out,
                fused_bidir=m.fused_bidir_encoder)
            self.filter_gen = DynamicFilterGen(
                c4_dim=m.c4_feat_dim, num_filters=m.num_filters,
                gate=m.response_gate, normalize=m.normalize_response,
                use_pallas=m.use_pallas)
        num_anchors = len(m.anchor_scales) * len(m.anchor_ratios)
        self.rpn_head = RPNHead(num_anchors=num_anchors, dtype=dtype)
        self.box_head = BoxHead(num_classes=m.num_classes)
        if m.use_mask_head:
            self.mask_head = MaskHead(num_classes=m.num_classes,
                                      up_matmul=m.mask_up_matmul)
        if m.use_caption_loss:
            from lang2seg_tpu.models.caption_zoo import setup_captioner
            self.captioner = setup_captioner(m)
        if m.use_attribute_head:
            # multi-label attribute scores from pooled ROI features
            # (capability parity with MAttNet's att branch,
            # eval_easy_utils.py:54-57)
            self.att_head = nn.Dense(m.num_attributes, name="att_head")

    # ---------- building blocks ----------

    def _anchors(self, h: int, w: int):
        m = self.cfg.model
        return shifted_anchors(h, w, m.feat_stride, m.anchor_scales,
                               m.anchor_ratios)

    def _condition(self, net_conv_e, labels, train):
        """Language encoding + dynamic-filter gating.
        net_conv_e: (E, h, w, C); labels: (E, T)."""
        _, hidden, _ = self.encoder(labels, train=train)
        return self.filter_gen(net_conv_e, hidden)

    def _roi_features(self, gated, rois, train: bool = False):
        """gated: (E, h, w, C); rois: (E, R, 4) in scaled-image coords.
        Returns spatial_fc7 (E, R, 7, 7, 2048) (resnet) / (E, R, 1, 1,
        4096) (vgg)."""
        m = self.cfg.model
        scale = 1.0 / m.feat_stride
        if m.pooling_mode == "pool":
            # POOLING_MODE='pool': ROI max-pooling (roi_pooling_kernel.cu
            # via roi_pool_py.py oracle); default 'crop' is the reference's
            # active path (model/config.py:273)
            from lang2seg_tpu.ops.roi_align import roi_max_pool
            crops = jax.vmap(
                lambda f, r: roi_max_pool(f, r, m.pooling_size, scale)
            )(gated, rois)
        else:
            crops = jax.vmap(
                lambda f, r: roi_crop_pool(f, r, m.pooling_size, scale,
                                           m.max_pool))(gated, rois)
        e, r = crops.shape[0], crops.shape[1]
        flat = crops.reshape(e * r, *crops.shape[2:])
        if m.backbone == "vgg16":
            fc7 = self.backbone.tail(flat, train=train)
        else:
            fc7 = self.backbone.tail(flat)
        return fc7.reshape(e, r, *fc7.shape[1:])

    # ---------- training ----------

    def train_forward(self, batch: Dict[str, jnp.ndarray],
                      targets: Optional[Tuple] = None
                      ) -> Dict[str, jnp.ndarray]:
        """batch:
          images   (I, H, W, 3) float32 mean-subtracted BGR, zero-padded
          im_hw    (I, 2) float32 true scaled extents
          labels   (E, T) int32 token ids, 0 pad (language mode only)
          img_idx  (E,) int32 image index per example
          gt_boxes (E, M, 5) float32 [x1 y1 x2 y2 cls] (scaled coords);
                   (E, 5) accepted as M=1 shorthand
          gt_valid (E, M) bool — optional, default all valid
          gt_masks (E, M, Hc, Wc) uint8 {0,1} canvas-sized (or (E, Hc, Wc))
        In language mode (cfg.model.use_language) each example is one
        expression with its single GT ref (M=1); in pretraining mode each
        example is one image with its padded GT set.

        `targets` optionally injects precomputed, E-batched
        (AnchorTargets, ProposalTargets) in place of the sampled ones —
        the torch train-parity harness uses this to pin loss/gradient
        values on identical targets without coupling to RNG subsampling
        order (the reference samples with npr.choice,
        anchor_target_layer.py:69-84; we use keyed random ranks).
        Returns dict of losses.
        """
        cfg, m, t = self.cfg, self.cfg.model, self.cfg.train
        images = batch["images"]
        if images.dtype == jnp.uint8:
            # uint8 wire format (cfg.data.wire_uint8_images): raw BGR,
            # mean-subtract on device — 4x less host->device transfer
            means = jnp.asarray(cfg.data.pixel_means_bgr, jnp.float32)
            images = images.astype(jnp.float32) - means
        e = batch["img_idx"].shape[0]

        gt_boxes = batch["gt_boxes"]
        if gt_boxes.ndim == 2:
            gt_boxes = gt_boxes[:, None, :]
        gt_masks = batch["gt_masks"]
        if gt_masks.ndim == 3:
            gt_masks = gt_masks[:, None]
        if cfg.data.wire_packed_masks and \
                gt_masks.shape[-1] * 8 == images.shape[2]:
            # bit-packed wire format: masks are np.packbits(_, axis=-1)
            # (MSB-first). Unpacking is gated on the config flag, not just
            # the shape, so a caller with wire_packed_masks=False can never
            # have a coincidental W/8-wide mask silently bit-unpacked.
            shifts = jnp.arange(7, -1, -1, dtype=jnp.uint8)
            bits = (gt_masks[..., None] >> shifts) & jnp.uint8(1)
            gt_masks = bits.reshape(*gt_masks.shape[:-1],
                                    gt_masks.shape[-1] * 8)
        elif gt_masks.shape[-1] != images.shape[2]:
            raise ValueError(
                f"gt_masks width {gt_masks.shape[-1]} is neither the canvas "
                f"width {images.shape[2]} nor its bit-packed form (with "
                f"cfg.data.wire_packed_masks={cfg.data.wire_packed_masks})")
        gt_valid = batch.get("gt_valid")
        if gt_valid is None:
            gt_valid = jnp.ones(gt_boxes.shape[:2], bool)

        net_conv_img = self.backbone.head(images)            # (I, h, w, C)
        net_conv = net_conv_img[batch["img_idx"]]            # (E, h, w, C)
        if m.use_language:
            gated, response = self._condition(net_conv, batch["labels"],
                                              train=True)
        else:
            gated, response = net_conv, None
        rpn_cls, rpn_box = self.rpn_head(gated)              # (E,h,w,A,2|4)
        _, h, w, a, _ = rpn_cls.shape
        anchors = self._anchors(h, w)                        # (N, 4)
        n = anchors.shape[0]

        im_hw = batch["im_hw"][batch["img_idx"]]             # (E, 2)
        key = self.make_rng("sampling")
        if "expr_uid" in batch:
            # per-example keys derived from stable example ids: sampling is
            # then invariant to batch composition/sharding (the data-parallel
            # step feeds each device its own block; identical examples draw
            # identical anchor/ROI subsamples either way)
            keys = jax.vmap(lambda u: jax.random.fold_in(key, u))(
                batch["expr_uid"])
        else:
            keys = jax.random.split(key, e)

        # `targets` may inject either side independently (None = compute);
        # the uncomputed side's ops never enter the graph, so removal-
        # based profiling can attribute the anchor sampler vs the
        # proposal+NMS+ROI-sampler chain separately.
        at_inj, pt_inj = targets if targets is not None else (None, None)
        need_at, need_pt = at_inj is None, pt_inj is None

        def per_expr(cls_e, box_e, hw, gt_b, gt_v, gt_m, k):
            k1, k2 = jax.random.split(k)
            at = anchor_targets(
                anchors, gt_b, gt_v, hw[0], hw[1], k1,
                rpn_batchsize=t.rpn_batchsize,
                fg_fraction=t.rpn_fg_fraction,
                pos_overlap=t.rpn_positive_overlap,
                neg_overlap=t.rpn_negative_overlap,
                clobber_positives=t.rpn_clobber_positives) if need_at \
                else None
            if need_pt:
                score_pos = jax.nn.softmax(
                    cls_e.reshape(n, 2), axis=-1)[:, 1]
                props = proposal_layer(
                    score_pos, box_e.reshape(n, 4), anchors, hw[0], hw[1],
                    t.rpn_pre_nms_top_n, t.rpn_post_nms_top_n,
                    t.rpn_nms_thresh, nms_block=m.nms_block,
                    nms_impl=m.nms_impl,
                    pallas_block=m.nms_pallas_block,
                    pallas_chunk=m.nms_pallas_chunk)
                pt = proposal_targets(
                    props.rois, props.valid, gt_b, gt_v,
                    gt_m.astype(jnp.uint8), k2,
                    num_rois=t.roi_batch_size, fg_fraction=t.fg_fraction,
                    fg_thresh=t.fg_thresh, bg_thresh_hi=t.bg_thresh_hi,
                    bg_thresh_lo=t.bg_thresh_lo, mask_size=m.mask_size,
                    normalize_means=t.bbox_normalize_means,
                    normalize_stds=t.bbox_normalize_stds, use_gt=t.use_gt)
            else:
                pt = None
            return at, pt

        at, pt = jax.vmap(per_expr)(
            rpn_cls, rpn_box, im_hw, gt_boxes, gt_valid, gt_masks, keys)
        at = at if need_at else at_inj
        pt = pt if need_pt else pt_inj

        # ---- RPN losses (network.py:372-387) ----
        rpn_logits = rpn_cls.reshape(e, n, 2)
        rpn_sel = (at.labels >= 0).astype(jnp.float32)
        rpn_ce = weighted_softmax_ce(
            rpn_logits, jnp.maximum(at.labels, 0), rpn_sel)
        rpn_l1 = smooth_l1(rpn_box.reshape(e, n, 4), at.bbox_targets,
                           at.bbox_inside_w[..., None],
                           at.bbox_outside_w[..., None], sigma=3.0)
        rpn_loss_box = jnp.sum(rpn_l1) / e

        # ---- ROI heads ----
        spatial_fc7 = self._roi_features(gated, pt.rois, train=True)
        r = spatial_fc7.shape[1]
        cls_score, bbox_pred = self.box_head(
            spatial_fc7.reshape(e * r, *spatial_fc7.shape[2:]))
        cls_score = cls_score.reshape(e, r, -1)
        bbox_pred = bbox_pred.reshape(e, r, m.num_classes, 4)

        roi_w = pt.roi_valid.astype(jnp.float32)
        ce = weighted_softmax_ce(cls_score, pt.labels, roi_w)

        # compact per-class bbox loss — math-identical to the reference's
        # class-expanded (R, 4K) layout since only the label class is active
        sel_pred = jnp.take_along_axis(
            bbox_pred, pt.labels[..., None, None].astype(jnp.int32), axis=2
        )[:, :, 0, :]                                        # (E, R, 4)
        l1 = smooth_l1(sel_pred, pt.bbox_targets,
                       pt.bbox_weight[..., None], pt.bbox_weight[..., None],
                       sigma=1.0)
        loss_box = jnp.sum(l1) / (e * r)

        losses = {"rpn_cross_entropy": rpn_ce, "rpn_loss_box": rpn_loss_box,
                  "cross_entropy": ce, "loss_box": loss_box}

        # ---- mask loss on fg slots (network.py:401-410) ----
        if m.use_mask_head:
            f = pt.mask_targets.shape[1]
            fg_fc7 = spatial_fc7[:, :f]
            lab = jnp.clip(pt.labels[:, :f], 0, m.num_classes - 1)
            # selected-class head output (R, S, S): each fg slot's
            # labelled class only — the all-class logits tensor the
            # reference materializes (network.py:401-410) is reduced by
            # take_along_axis immediately, so computing just the
            # selected column is the same math minus the (R, S, S, 81)
            # intermediate (chip A/B in models/heads._ClassConv1x1)
            sel = self.mask_head(
                fg_fc7.reshape(e * f, *fg_fc7.shape[2:]),
                labels=lab.reshape(e * f))
            sel = sel.reshape(e, f, m.mask_size, m.mask_size)
            bce = bce_with_logits(sel, pt.mask_targets)
            mw = pt.mask_weight                              # (E, F)
            bce = jnp.where(mw[:, :, None, None] > 0, bce, 0.0)
            denom = jnp.maximum(jnp.sum(mw), 1.0) * m.mask_size * m.mask_size
            losses["loss_mask"] = jnp.sum(bce * mw[:, :, None, None]) / denom

        # ---- response loss (network_7f_response.py:411-428) ----
        if m.use_response_loss and m.use_language:
            stride = m.feat_stride
            # nearest-downsample canvas mask by stride (center sample,
            # scipy-oracle-pinned — see response_target); normalized
            # over the true-image region only (the reference computes
            # on the exact-size map)
            tgt = jax.vmap(
                lambda g: response_target(g, stride, h, w))(gt_masks[:, 0])
            fy = jnp.arange(h)[None, :, None] * stride < im_hw[:, 0, None, None]
            fx = jnp.arange(w)[None, None, :] * stride < im_hw[:, 1, None, None]
            vmask = (fy & fx).astype(jnp.float32)
            bce = bce_with_logits(response[..., 0], tgt)
            losses["loss_response"] = (jnp.sum(bce * vmask)
                                       / jnp.maximum(jnp.sum(vmask), 1.0))

        # ---- attribute loss (multi-label BCE on GT-box features) ----
        if m.use_attribute_head and "att_labels" in batch:
            # crop the (un-gated) conv map at the GT box: attributes are a
            # property of the referred object, not the expression
            gt_fc7 = self._roi_features(net_conv,
                                        gt_boxes[:, :1, :4])  # (E,1,7,7,D)
            pooled = gt_fc7[:, 0].mean(axis=(1, 2)).astype(jnp.float32)
            att_logits = self.att_head(pooled)               # (E, A)
            att_bce = bce_with_logits(att_logits, batch["att_labels"])
            av = batch.get("att_valid",
                           jnp.ones((e,), bool)).astype(jnp.float32)
            denom = jnp.maximum(jnp.sum(av), 1.0) * att_logits.shape[1]
            losses["loss_att"] = m.att_loss_weight * \
                jnp.sum(att_bce * av[:, None]) / denom

        # ---- caption (cycle-consistency) loss ----
        if m.use_caption_loss and m.use_language:
            losses["loss_caption"] = m.cap_loss_weight * self._caption_loss(
                net_conv, gated, response, batch, gt_masks)

        losses["total_loss"] = sum(losses.values())
        return losses

    def _caption_loss(self, net_conv, gated, response, batch, gt_masks):
        """Cycle-consistency: an att2in2 captioner must reconstruct the
        expression from segmented-region features.

        Variant 'res5_2' (network_cycle_res5_2.py:415-448): res5 features of
        the whole image concat GT-mask-gated features. Variant 'response'
        (network_cycle_response.py:424-453): features before vs after
        response gating. Selected by cfg.model.response_gate == 'sigmoid'
        ? 'response' : 'res5_2' to mirror which reference net pairs them.
        """
        m = self.cfg.model
        e, h, w, c = net_conv.shape
        if m.response_gate == "sigmoid":
            feats_a = net_conv
            feats_b = gated
        else:
            stride = m.feat_stride
            gm = gt_masks[:, 0].astype(jnp.float32)
            mk = gm[:, stride // 2::stride, stride // 2::stride][:, :h, :w]
            mk = (mk >= 0.5).astype(net_conv.dtype)
            feats_a = net_conv
            feats_b = net_conv * mk[..., None]
        fc5a = self.backbone.tail(feats_a)   # (E, h, w, 2048)
        fc5b = self.backbone.tail(feats_b)
        fc_feat = jnp.concatenate(
            [fc5a.mean(axis=(1, 2)), fc5b.mean(axis=(1, 2))], axis=-1)
        att_a = _adaptive_pool(fc5a, 14)
        att_b = _adaptive_pool(fc5b, 14)
        att_feat = jnp.concatenate([att_a, att_b], axis=-1)
        att_feat = att_feat.reshape(e, 14 * 14, -1)
        return self.captioner.teacher_forced_nll(
            fc_feat.astype(jnp.float32), att_feat.astype(jnp.float32),
            batch["cap_labels"], batch["cap_masks"])

    # ---------- inference ----------

    def test_forward(self, batch: Dict[str, jnp.ndarray]
                     ) -> Dict[str, jnp.ndarray]:
        """Single-image, batched-expression inference.

        batch: images (1, H, W, 3), im_hw (1, 2), labels (E, T).
        Returns per-expression rois/scores/boxes + the gated conv map for
        the follow-up mask prediction (reference test_image,
        network.py:625-642)."""
        cfg, m, ts = self.cfg, self.cfg.model, self.cfg.test
        images = batch["images"]
        if images.dtype == jnp.uint8:
            # uint8 wire format — see train_forward
            means = jnp.asarray(cfg.data.pixel_means_bgr, jnp.float32)
            images = images.astype(jnp.float32) - means
        net_conv_img = self.backbone.head(images)
        e = batch["labels"].shape[0]
        net_conv = jnp.broadcast_to(
            net_conv_img, (e,) + net_conv_img.shape[1:])
        gated, response = self._condition(net_conv, batch["labels"],
                                          train=False)
        rpn_cls, rpn_box = self.rpn_head(gated)
        _, h, w, a, _ = rpn_cls.shape
        anchors = self._anchors(h, w)
        n = anchors.shape[0]
        hw = batch["im_hw"][0]

        def per_expr(cls_e, box_e, k):
            score_pos = jax.nn.softmax(cls_e.reshape(n, 2), axis=-1)[:, 1]
            if ts.mode == "top":
                # NMS-free top-N alternative (cfg.TEST.MODE='top',
                # proposal_top_layer.py:18-67); when n < top_n the layer
                # random-pads with replacement, so it needs a key
                return proposal_top_layer(
                    score_pos, box_e.reshape(n, 4), anchors, hw[0], hw[1],
                    ts.rpn_top_n, k)
            return proposal_layer(
                score_pos, box_e.reshape(n, 4), anchors, hw[0], hw[1],
                ts.rpn_pre_nms_top_n, ts.rpn_post_nms_top_n,
                ts.rpn_nms_thresh, nms_block=m.nms_block,
                nms_impl=m.nms_impl,
                pallas_block=m.nms_pallas_block,
                pallas_chunk=m.nms_pallas_chunk)

        # 'top' mode's random pad re-draws per call in the reference
        # (proposal_top_layer.py:40); batches carry a per-image uid to
        # fold in so successive images draw different pads under jit
        base_key = jax.random.PRNGKey(cfg.seed)
        if "rng_uid" in batch:
            base_key = jax.random.fold_in(base_key, batch["rng_uid"])
        keys = jax.random.split(base_key, e)
        props = jax.vmap(per_expr)(rpn_cls, rpn_box, keys)
        spatial_fc7 = self._roi_features(gated, props.rois)
        r = spatial_fc7.shape[1]
        cls_score, bbox_pred = self.box_head(
            spatial_fc7.reshape(e * r, *spatial_fc7.shape[2:]))
        cls_score = cls_score.reshape(e, r, -1)
        cls_prob = jax.nn.softmax(cls_score, axis=-1)
        bbox_pred = bbox_pred.reshape(e, r, m.num_classes, 4)
        # de-normalize deltas (network.py:607-613)
        stds = jnp.asarray(self.cfg.train.bbox_normalize_stds)
        means = jnp.asarray(self.cfg.train.bbox_normalize_means)
        bbox_pred = bbox_pred * stds[None, None, None, :] \
            + means[None, None, None, :]
        return {"rois": props.rois, "roi_valid": props.valid,
                "cls_score": cls_score, "cls_prob": cls_prob,
                "bbox_pred": bbox_pred.reshape(e, r, -1),
                "gated_conv": gated, "response": response}

    def predict_attribute_scores(self, images: jnp.ndarray,
                                 boxes: jnp.ndarray) -> jnp.ndarray:
        """Sigmoid attribute scores for GT/candidate boxes.

        images: (1, H, W, 3); boxes: (1, B, 4) scaled coords.
        Returns (1, B, num_attributes) in [0, 1] (reference
        eval_easy_utils.py:54-57 thresholds these at 0.5)."""
        if images.dtype == jnp.uint8:
            # uint8 wire format — see train_forward
            means = jnp.asarray(self.cfg.data.pixel_means_bgr, jnp.float32)
            images = images.astype(jnp.float32) - means
        net_conv = self.backbone.head(images)
        fc7 = self._roi_features(net_conv, boxes)
        pooled = fc7.mean(axis=(2, 3)).astype(jnp.float32)
        return jax.nn.sigmoid(self.att_head(pooled))

    def predict_masks(self, gated_conv: jnp.ndarray, boxes: jnp.ndarray,
                      labels: jnp.ndarray) -> jnp.ndarray:
        """Mask probs for given boxes/classes
        (reference _predict_masks_from_boxes_and_labels, network.py:550-581).

        gated_conv: (E, h, w, C); boxes: (E, B, 4) scaled coords;
        labels: (E, B) int class ids. Returns (E, B, S, S) in [0, 1]."""
        m = self.cfg.model
        fc7 = self._roi_features(gated_conv, boxes)          # (E,B,7,7,D)
        e, b = fc7.shape[0], fc7.shape[1]
        sel = self.mask_head(fc7.reshape(e * b, *fc7.shape[2:]),
                             labels=labels.reshape(e * b).astype(jnp.int32))
        return jax.nn.sigmoid(sel.reshape(e, b, m.mask_size, m.mask_size))


def _adaptive_pool(x: jnp.ndarray, out: int) -> jnp.ndarray:
    """torch adaptive_avg_pool2d semantics on NHWC (B, H, W, C) -> (B, out,
    out, C): bin i covers [floor(i*H/out), ceil((i+1)*H/out))."""
    b, h, w, c = x.shape

    def pool_axis(arr, size, axis):
        outs = []
        for i in range(out):
            s = (i * size) // out
            t = -(-((i + 1) * size) // out)
            sl = [slice(None)] * arr.ndim
            sl[axis] = slice(s, t)
            outs.append(arr[tuple(sl)].mean(axis=axis, keepdims=True))
        return jnp.concatenate(outs, axis=axis)

    return pool_axis(pool_axis(x, h, 1), w, 2)
