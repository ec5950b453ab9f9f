"""Torch-checkpoint -> lang2seg_tpu params converter.

The reference depends on externally-pretrained torch checkpoints
(res101 Mask R-CNN `res101_mask_rcnn_iter_1250000.pth`, vgg16 faster-rcnn,
att2in2 captioner `model-best.pth` — tools/train.py:78,
caption_models/__init__.py:45-52) loaded with size-mismatch-tolerant copy
(train_val.py:111-124). This module maps those state_dicts onto our
NHWC/flax parameter tree:

  * conv weights (O,I,kh,kw) -> (kh,kw,I,O); linear (O,I) -> (I,O)
  * BatchNorm weight/bias/running_mean/running_var ->
    FrozenBatchNorm scale/bias/mean/var
  * RPN cls head channels: torch packs class-major (cls*A + a) for its
    reshape trick (network.py:239); ours is (..., A, 2) -> permute
  * torch LSTM weight_ih_l0/_reverse -> lstm_fwd/lstm_bwd (transposed)
  * 7-filter heads dynamic_fc_0..6 -> one fused Dense (concat outputs)
  * vgg fc6: torch flattens (C,7,7) channel-major, ours (7,7,C) -> permute
  * captioner Sequential indices (embed.0, fc_embed.0, ...) -> raw params

Use `convert_torch_state_dict` for a full mapping, then
`tolerant_restore_params` (checkpoint.py) to copy whatever matches.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from lang2seg_tpu.config import Config


def _t(x):
    return np.asarray(x)


def _conv(w):
    return _t(w).transpose(2, 3, 1, 0)         # (O,I,kh,kw)->(kh,kw,I,O)


def _convT(w):
    # (I,O,kh,kw)->(kh,kw,I,O), spatially flipped: torch ConvTranspose2d is
    # the gradient of a conv (kernel applied flipped), while flax
    # nn.ConvTranspose(transpose_kernel=False) runs a plain fractionally-
    # strided conv — without the flip every converted deconv kernel is
    # rotated 180 deg per block.
    return _t(w).transpose(2, 3, 0, 1)[::-1, ::-1]


def _lin(w):
    return _t(w).T                             # (O,I)->(I,O)


def _bn(sd, prefix):
    return {"scale": _t(sd[f"{prefix}.weight"]),
            "bias": _t(sd[f"{prefix}.bias"]),
            "mean": _t(sd[f"{prefix}.running_mean"]),
            "var": _t(sd[f"{prefix}.running_var"])}


def _set(tree: Dict, path, value):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def convert_resnet_backbone(sd: Dict, depth: str = "resnet101",
                            prefix: str = "resnet.") -> Dict:
    blocks = {"resnet26": (1, 1, 1, 1), "resnet50": (3, 4, 6, 3),
              "resnet101": (3, 4, 23, 3), "resnet152": (3, 8, 36, 3)}[depth]
    out: Dict = {}
    out["conv1"] = {"kernel": _conv(sd[f"{prefix}conv1.weight"])}
    out["bn1"] = _bn(sd, f"{prefix}bn1")
    for li, n in enumerate(blocks, start=1):
        layer: Dict = {}
        for bi in range(n):
            tb = f"{prefix}layer{li}.{bi}"
            blk: Dict = {}
            for ci in (1, 2, 3):
                blk[f"conv{ci}"] = {"kernel": _conv(sd[f"{tb}.conv{ci}.weight"])}
                blk[f"bn{ci}"] = _bn(sd, f"{tb}.bn{ci}")
            if f"{tb}.downsample.0.weight" in sd:
                blk["downsample_conv"] = {
                    "kernel": _conv(sd[f"{tb}.downsample.0.weight"])}
                blk["downsample_bn"] = _bn(sd, f"{tb}.downsample.1")
            layer[f"block{bi}"] = blk
        out[f"layer{li}"] = layer
    return out


def convert_vgg_backbone(sd: Dict, prefix: str = "vgg.") -> Dict:
    """torchvision vgg16.features indices -> our conv names."""
    feat_map = {  # features index -> our name
        0: "conv1_1", 2: "conv1_2", 5: "conv2_1", 7: "conv2_2",
        10: "conv3_1", 12: "conv3_2", 14: "conv3_3",
        17: "conv4_1", 19: "conv4_2", 21: "conv4_3",
        24: "conv5_1", 26: "conv5_2", 28: "conv5_3"}
    # flat under the backbone scope: the VGG16 flax module names its
    # convs conv1_1..conv5_3 directly (models/vgg.py:35-37), not under a
    # "convs" subtree — the dict attribute does not open a scope
    # (caught by tests/test_convert_full.py: the old nested layout left
    # every trunk conv silently unrestored under tolerant restore)
    out: Dict = {}
    for idx, name in feat_map.items():
        k = f"{prefix}features.{idx}"
        out[name] = {"kernel": _conv(sd[f"{k}.weight"]),
                     "bias": _t(sd[f"{k}.bias"])}
    # classifier.0 = fc6 (input was (512,7,7) channel-major flatten; ours
    # is (7,7,512) flatten -> permute input dim)
    w6 = _t(sd[f"{prefix}classifier.0.weight"])          # (out, 512*7*7)
    o = w6.shape[0]
    w6 = w6.reshape(o, 512, 7, 7).transpose(0, 2, 3, 1).reshape(o, -1)
    out["fc6"] = {"kernel": w6.T,
                  "bias": _t(sd[f"{prefix}classifier.0.bias"])}
    out["fc7"] = {"kernel": _lin(sd[f"{prefix}classifier.3.weight"]),
                  "bias": _t(sd[f"{prefix}classifier.3.bias"])}
    return out


def convert_rpn(sd: Dict, num_anchors: int) -> Dict:
    a = num_anchors
    out: Dict = {}
    out["rpn_conv"] = {"kernel": _conv(sd["rpn_net.weight"]),
                       "bias": _t(sd["rpn_net.bias"])}
    # cls: torch channel = cls*A + a  ->  ours = a*2 + cls
    wc = _conv(sd["rpn_cls_score_net.weight"])            # (1,1,512,2A)
    bc = _t(sd["rpn_cls_score_net.bias"])
    perm = np.asarray([[cls * a + ai for cls in range(2)]
                       for ai in range(a)]).reshape(-1)
    out["rpn_cls"] = {"kernel": wc[..., perm], "bias": bc[perm]}
    # bbox: torch channel = a*4 + d, same as ours
    out["rpn_bbox"] = {"kernel": _conv(sd["rpn_bbox_pred_net.weight"]),
                       "bias": _t(sd["rpn_bbox_pred_net.bias"])}
    return out


def convert_heads(sd: Dict) -> Dict:
    out: Dict = {}
    out["box_head"] = {
        "cls_score": {"kernel": _lin(sd["cls_score_net.weight"]),
                      "bias": _t(sd["cls_score_net.bias"])},
        "bbox_pred": {"kernel": _lin(sd["bbox_pred_net.weight"]),
                      "bias": _t(sd["bbox_pred_net.bias"])}}
    if "mask_up_sampling.weight" in sd:
        out["mask_head"] = {
            "mask_up": {"kernel": _convT(sd["mask_up_sampling.weight"]),
                        "bias": _t(sd["mask_up_sampling.bias"])},
            "mask_pred": {"kernel": _conv(sd["mask_pred_net.weight"]),
                          "bias": _t(sd["mask_pred_net.bias"])}}
    return out


def convert_lang_encoder(sd: Dict, prefix: str = "rnn_encoder.") -> Dict:
    out: Dict = {
        "embedding": {"embedding": _t(sd[f"{prefix}embedding.weight"])},
        "mlp": {"kernel": _lin(sd[f"{prefix}mlp.0.weight"]),
                "bias": _t(sd[f"{prefix}mlp.0.bias"])},
        "lstm_fwd": {
            "w_ih": _lin(sd[f"{prefix}rnn.weight_ih_l0"]),
            "w_hh": _lin(sd[f"{prefix}rnn.weight_hh_l0"]),
            "bias_ih": _t(sd[f"{prefix}rnn.bias_ih_l0"]),
            "bias_hh": _t(sd[f"{prefix}rnn.bias_hh_l0"])}}
    if f"{prefix}rnn.weight_ih_l0_reverse" in sd:
        out["lstm_bwd"] = {
            "w_ih": _lin(sd[f"{prefix}rnn.weight_ih_l0_reverse"]),
            "w_hh": _lin(sd[f"{prefix}rnn.weight_hh_l0_reverse"]),
            "bias_ih": _t(sd[f"{prefix}rnn.bias_ih_l0_reverse"]),
            "bias_hh": _t(sd[f"{prefix}rnn.bias_hh_l0_reverse"])}
    return out


def convert_dynamic_filters(sd: Dict, num_filters: int) -> Dict:
    out: Dict = {}
    if num_filters == 1:
        out["dynamic_fc"] = {"kernel": _lin(sd["dynamic_fc.weight"]),
                             "bias": _t(sd["dynamic_fc.bias"])}
    else:
        ws = [_lin(sd[f"dynamic_fc_{i}.weight"]) for i in range(num_filters)]
        bs = [_t(sd[f"dynamic_fc_{i}.bias"]) for i in range(num_filters)]
        out["dynamic_fc"] = {"kernel": np.concatenate(ws, axis=1),
                             "bias": np.concatenate(bs)}
        if "response_fc.weight" in sd:
            out["response_fc"] = {"kernel": _lin(sd["response_fc.weight"]),
                                  "bias": _t(sd["response_fc.bias"])}
    return out


def convert_captioner(sd: Dict, prefix: str = "caption_model.") -> Dict:
    def g(k):
        return sd[f"{prefix}{k}"]

    return {
        "embed_w": _t(g("embed.0.weight")),
        "logit_w": _lin(g("logit.weight")),
        "logit_b": _t(g("logit.bias")),
        "a2c_w": _lin(g("core.a2c.weight")),
        "a2c_b": _t(g("core.a2c.bias")),
        "i2h_w": _lin(g("core.i2h.weight")),
        "i2h_b": _t(g("core.i2h.bias")),
        "h2h_w": _lin(g("core.h2h.weight")),
        "h2h_b": _t(g("core.h2h.bias")),
        "h2att_w": _lin(g("core.attention.h2att.weight")),
        "h2att_b": _t(g("core.attention.h2att.bias")),
        "alpha_w": _lin(g("core.attention.alpha_net.weight")),
        "alpha_b": _t(g("core.attention.alpha_net.bias")),
        "fc_embed": {"kernel": _lin(g("fc_embed.0.weight")),
                     "bias": _t(g("fc_embed.0.bias"))},
        "att_embed": {"kernel": _lin(g("att_embed.0.weight")),
                      "bias": _t(g("att_embed.0.bias"))},
        "ctx2att": {"kernel": _lin(g("ctx2att.weight")),
                    "bias": _t(g("ctx2att.bias"))},
    }


def convert_torch_state_dict(sd: Dict, cfg: Config) -> Dict:
    """Full-network state_dict (reference net.state_dict()) -> our params
    tree. Missing pieces are simply absent (pair with
    tolerant_restore_params)."""
    m = cfg.model
    a = len(m.anchor_scales) * len(m.anchor_ratios)
    out: Dict = {}
    if any(k.startswith("resnet.") for k in sd):
        out["backbone"] = convert_resnet_backbone(sd, m.backbone)
    if any(k.startswith("vgg.") for k in sd):
        out["backbone"] = convert_vgg_backbone(sd)
    if "rpn_net.weight" in sd:
        out["rpn_head"] = convert_rpn(sd, a)
    out.update(convert_heads(sd))
    if any(k.startswith("rnn_encoder.") for k in sd):
        out["encoder"] = convert_lang_encoder(sd)
    if "dynamic_fc.weight" in sd or "dynamic_fc_0.weight" in sd:
        out["filter_gen"] = convert_dynamic_filters(sd, m.num_filters)
    if any(k.startswith("caption_model.") for k in sd):
        out["captioner"] = convert_captioner(sd)
    return out


def load_params_file(path: str, cfg: Optional[Config] = None) -> Dict:
    """Load .npz (our format) or .pth (torch state_dict; converted when
    cfg given)."""
    if path.endswith(".npz"):
        flat = dict(np.load(path, allow_pickle=False))
        tree: Dict = {}
        for k, v in flat.items():
            _set(tree, tuple(k.split("/")), v)
        return tree
    if path.endswith((".pth", ".pt")):
        import torch
        sd = torch.load(path, map_location="cpu")
        if hasattr(sd, "state_dict"):
            sd = sd.state_dict()
        sd = {k: v.numpy() for k, v in sd.items()}
        if cfg is not None:
            return convert_torch_state_dict(sd, cfg)
        return sd
    raise ValueError(f"unsupported params file: {path}")
