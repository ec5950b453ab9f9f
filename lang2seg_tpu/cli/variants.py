"""Experiment variants.

The reference encodes each variant as a separate (train_X.py, network_X.py,
resnet_v1_X.py, train_val_X.py) file set (SURVEY §2/§7); here a variant is
a named config preset:

| variant        | reference entry            | preset                        |
|----------------|----------------------------|-------------------------------|
| baseline       | tools/train.py             | 1 filter, multiply gate       |
| spatial        | tools/train_spatial.py     | 7 filters, multiply gate      |
| response       | tools/train_response.py    | 7f, sigmoid gate, +resp loss  |
| vgg            | tools/train_vgg.py         | vgg16, 7f+resp, det-only      |
| cycle          | tools/train_cycle_2.py     | 7f, +caption loss, lang lr 1x |
| cycle_response | tools/train_cycle_response.py | 7f+resp+caption, lang lr 1x |
"""

from __future__ import annotations

from lang2seg_tpu.config import Config

VARIANTS = ("baseline", "spatial", "response", "vgg", "cycle",
            "cycle_response", "pretrain")


def apply_variant(cfg: Config, variant: str) -> Config:
    m, t = cfg.model, cfg.train
    if variant == "baseline":
        m.num_filters = 1
        m.response_gate = "multiply"
    elif variant == "spatial":
        m.num_filters = 7
        m.response_gate = "multiply"
    elif variant == "response":
        m.num_filters = 7
        m.response_gate = "sigmoid"
        m.use_response_loss = True
    elif variant == "vgg":
        m.backbone = "vgg16"
        m.c4_feat_dim = 512
        m.num_filters = 7
        m.response_gate = "sigmoid"
        m.use_response_loss = True
        m.use_mask_head = False
        # vgg twin config diffs (model/config_vgg.py:28,40)
        t.weight_decay = 5e-4
        t.double_bias = True
        t.snapshot_prefix = "vgg16_faster_rcnn"
    elif variant == "cycle":
        m.num_filters = 7
        m.response_gate = "multiply"
        m.use_caption_loss = True
        t.lang_lr_mult = 1.0          # disabled in cycle variants
        t.max_iters = 800000
    elif variant == "pretrain":
        # no-language Mask R-CNN on coco_minus_refer (the reference's
        # pretraining stage, mask-faster-rcnn/tools/trainval_net.py)
        m.use_language = False
        t.max_iters = 1250000
    elif variant == "cycle_response":
        m.num_filters = 7
        m.response_gate = "sigmoid"
        m.use_response_loss = True
        m.use_caption_loss = True
        t.lang_lr_mult = 1.0
        t.max_iters = 800000
    else:
        raise ValueError(f"unknown variant {variant}; one of {VARIANTS}")
    return cfg
