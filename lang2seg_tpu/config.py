"""Configuration tree for lang2seg_tpu.

Mirrors the reference's three-tier config (global EasyDict `cfg` + YAML
overlay + ``--set KEY VALUE`` dotted overrides, see reference
`mask-faster-rcnn/lib/model/config.py:358-387`) as a typed dataclass tree
with the same override semantics.

Defaults track the reference's `model/config.py` (res101 experiment):
LR 1e-4, STEPSIZE [360000], ROI batch 256 @ 25% fg, RPN batch 256 @ 50% fg,
RPN pre/post-NMS 12000/2000 train and 6000/300 test, anchors
scales [4,8,16,32] x ratios [0.5,1,2] stride 16, pooling 7, mask 14.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, List, Optional, Tuple


@dataclass
class TrainConfig:
    learning_rate: float = 1e-4
    momentum: float = 0.9
    weight_decay: float = 1e-4
    gamma: float = 0.1                      # LR decay factor at each stepsize
    stepsize: Tuple[int, ...] = (360000,)   # iters at which LR *= gamma
    max_iters: int = 600000
    double_bias: bool = False               # biases get lr*(1+double_bias)
    bias_decay: bool = False                # apply weight decay to biases
    truncated: bool = False                 # truncated-normal init
    # torch-SGD update applied over per-(lr_mult, wd)-group contiguous
    # flat buffers (4 kernels) instead of ~122 per-leaf kernel chains;
    # bit-identical math (engine/optimizer.build_fused_optimizer).
    # Default OFF: measured NEGATIVE in-step on the real chip — the
    # standalone probe prices flat at 0.03 ms vs chain 1.03 ms, but
    # in-step the tree<->flat boundary forces relayouts of every conv
    # kernel's tiled layout and the step is 6.6 ms SLOWER fused
    # (177.7 chain vs 184.3 fused, removal-A/B protocol — docs/ROUND5.md
    # §10; the r5 "fused faster" bench attribution was the bundled
    # Pallas-NMS landing's win, not this flag's)
    fused_optimizer: bool = False
    grad_clip_norm: float = 0.0             # 0 = off (reference ships
                                            # clip_gradient in misc/utils)
    # 10x LR for language/dynamic-filter/response params
    # (reference train_val.py:193-198; disabled in cycle variants)
    lang_lr_mult: float = 10.0

    # ROI sampling (proposal targets)
    roi_batch_size: int = 256
    fg_fraction: float = 0.25
    fg_thresh: float = 0.5
    bg_thresh_hi: float = 0.5
    bg_thresh_lo: float = 0.0
    use_gt: bool = False                    # include GT boxes as candidate rois

    # bbox target normalization
    bbox_normalize_targets: bool = True
    bbox_normalize_means: Tuple[float, ...] = (0.0, 0.0, 0.0, 0.0)
    bbox_normalize_stds: Tuple[float, ...] = (0.1, 0.1, 0.2, 0.2)

    # RPN targets
    rpn_positive_overlap: float = 0.7
    rpn_negative_overlap: float = 0.3
    rpn_clobber_positives: bool = False
    rpn_fg_fraction: float = 0.5
    rpn_batchsize: int = 256
    rpn_positive_weight: float = -1.0

    # RPN proposal filtering
    rpn_pre_nms_top_n: int = 12000
    rpn_post_nms_top_n: int = 2000
    rpn_nms_thresh: float = 0.7

    # snapshots
    snapshot_iters: int = 5000
    snapshot_kept: int = 120
    snapshot_prefix: str = "res101_mask_rcnn"
    display: int = 20
    summary_interval: int = 500
    # when set, the trainer dumps response-map / net_conv PNGs for one
    # val example under <dir>/{response,net_conv} every summary_interval
    # (reference save=1 side channel, nets/network.py:481-517)
    debug_save_dir: str = ""

    # image preprocessing
    scales: Tuple[int, ...] = (600,)
    max_size: int = 1000

    # batching (ours; reference is 1 sentence / step)
    expressions_per_batch: int = 8
    images_per_batch: int = 2
    # SGD steps fused into one jit dispatch (lax.scan over the step
    # body; ours — the reference dispatches per sentence). >1 amortizes
    # the per-dispatch host round trip, which on remote/tunneled devices
    # rivals the step compute itself. Semantics are identical to single
    # stepping (same RNG chain, per-group SGD); only snapshot timing
    # quantizes to dispatch boundaries (the Trainer shrinks groups to
    # land snapshots/decay boundaries exactly).
    steps_per_dispatch: int = 1


@dataclass
class TestConfig:
    mode: str = "nms"                       # 'nms' | 'top'
    rpn_pre_nms_top_n: int = 6000
    rpn_post_nms_top_n: int = 300
    rpn_nms_thresh: float = 0.7
    rpn_top_n: int = 5000                   # for mode='top'
    scales: Tuple[int, ...] = (600,)
    max_size: int = 1000
    mask_threshold: float = 122.0 / 255.0   # paste-back binarization (test.py:334)


@dataclass
class ModelConfig:
    backbone: str = "resnet101"             # 'resnet101' | 'resnet50' | 'vgg16'
    num_classes: int = 81
    anchor_scales: Tuple[int, ...] = (4, 8, 16, 32)
    anchor_ratios: Tuple[float, ...] = (0.5, 1.0, 2.0)
    feat_stride: int = 16
    pooling_size: int = 7
    mask_size: int = 14
    pooling_mode: str = "crop"              # 'crop' | 'pool' (POOLING_MODE, config.py:273)
    nms_block: int = 256                    # NMS tile size — pure perf knob,
                                            # bit-identical for any value
                                            # (ops/nms.py). Swept on the v5e
                                            # at the 12000->2000 train shape:
                                            # 128/256/512/1024 -> 8.29/7.78/
                                            # 8.07/10.71 ms standalone E=16
                                            # (experiments/bench_nms_block.py)
    # pallas-kernel tile sizes (independent of nms_block, which is
    # tuned for the XLA while_loop where 512 is WORSE). r5 sweep at the
    # real-RPN (16, 12000)->2000 draw, all bit-identical
    # (experiments/bench_nms_pallas.py --sweep): block x chunk
    # {128,256,512}^2 spans 5.65-6.95 ms with 512/512 best — a flat
    # landscape, so the kernel is not tile-bound and the ~5.7 ms is its
    # real cost on this draw (the 2-4 ms VPU estimate assumed fewer
    # live frontier chunks than the untrained-RPN draw produces)
    nms_pallas_block: int = 512
    nms_pallas_chunk: int = 512
    nms_impl: str = "auto"                  # proposal-layer NMS kernel:
                                            # 'xla' while_loop | 'pallas'
                                            # VMEM-frontier kernel | 'auto'
                                            # = pallas iff TPU backend.
                                            # Bit-identical wire format
                                            # (tests/test_nms_pallas.py +
                                            # compiled assert in
                                            # experiments/bench_nms_pallas
                                            # .py); chip: 17.0 -> 5.8 ms
                                            # at the real in-step
                                            # distribution
    max_pool: bool = False                  # crop 2x then maxpool (RESNET.MAX_POOL)
    fixed_blocks: int = 1                   # frozen resnet stages (conv1 always frozen)
    c4_feat_dim: int = 1024                 # 512 for vgg16

    # language encoder (reference tools/opt.py defaults)
    vocab_size: int = 2000                  # overwritten from dataset vocab
    word_embedding_size: int = 512
    word_vec_size: int = 512
    rnn_hidden_size: int = 512
    rnn_num_layers: int = 1
    bidirectional: bool = True
    word_drop_out: float = 0.5
    rnn_drop_out: float = 0.2
    rnn_type: str = "lstm"
    variable_lengths: bool = True

    # language conditioning on/off (off = plain Mask R-CNN, the
    # coco_minus_refer pretraining capability, SURVEY §3.5)
    use_language: bool = True

    # dynamic-filter conditioning
    num_filters: int = 1                    # 1 (baseline) | 7 (spatial)
    response_gate: str = "multiply"         # 'multiply' | 'sigmoid' (response variants)
    normalize_response: bool = False        # 1/sqrt(C) response scaling (scratch-training aid)
    use_pallas: bool = False                # fused Pallas conditioning kernel

    # loss set (the reference's per-variant network files collapse to this)
    use_mask_head: bool = True              # False for vgg detection-only variant
    use_response_loss: bool = False
    use_caption_loss: bool = False
    cap_loss_weight: float = 1.0

    # attribute prediction (MAttNet-lineage capability: att vocab from
    # prepro + multi-label head + P/R/F1 eval, eval_easy_utils.py:17-91)
    use_attribute_head: bool = False
    num_attributes: int = 50
    att_loss_weight: float = 1.0

    # captioner (att2in2; reference tools/opt_cycle.py:81-117)
    caption_model: str = "att2in2"
    cap_vocab_size: int = 2000
    cap_seq_length: int = 10
    cap_rnn_size: int = 512
    cap_input_encoding_size: int = 512
    cap_att_hid_size: int = 512
    cap_fc_feat_size: int = 4096
    cap_att_feat_size: int = 4096
    cap_drop_prob_lm: float = 0.5
    cap_scheduled_sampling_prob: float = 0.0
    # annealing schedule (opt_cycle.py:106-109), epoch-indexed
    cap_ss_start: int = -1                  # -1 = disabled
    cap_ss_increase_every: int = 5
    cap_ss_increase_prob: float = 0.05
    cap_ss_max_prob: float = 0.25

    # numerics
    compute_dtype: str = "bfloat16"         # backbone conv compute dtype
    param_dtype: str = "float32"
    # ROI-tail (layer4 on 7x7 crops) as explicit MXU matmuls — same math
    # and params as the conv lowering. Measured SLOWER than the XLA conv
    # on-chip (experiments/ablate.py r2: 33.4 vs 48.4 expr/s — the 9
    # shifted window reads cost more HBM than the MXU tiling saves); kept
    # as a documented alternative, off by default.
    tail_matmul: bool = False
    # both bi-LSTM directions in one lax.scan (halves the sequential
    # chain; models/lang_encoder.py RNNEncoder.fused_bidir). Measured
    # NEUTRAL inside the fused train step on the r3 chip (71.6 vs 71.8
    # expr/s, experiments/ablate_r3.py) — kept on: exact-equivalent and
    # strictly less serial latency.
    fused_bidir_encoder: bool = True
    # mask-head deconv lowered as 1x1-matmul + depth-to-space (exact for
    # the non-overlapping 2x2/stride-2 kernel; models/heads.py
    # _Upsample2x). Also measured neutral in-step (the 9.3ms standalone
    # attribution was dispatch/layout cost the fused step already hides).
    mask_up_matmul: bool = True
    # conv1 stem evaluated via the lossless 2x2 space-to-depth re-layout
    # (models/resnet.py Conv1): same (7,7,3,64) parameter, stride-1 4x4
    # conv over a (H/2, W/2, 12) input. Measured NEUTRAL-to-slower on
    # this chip (69.5 vs 69.8 expr/s in-step; standalone conv1 fwd 4.2ms
    # vs 2.26ms plain — XLA's stride-2 stem lowering is already fine
    # here), so off by default; kept as the documented re-layout for
    # stems that do bottleneck.
    head_s2d: bool = False
    # ROI-tail as one large mosaic image (8-px pitch, zero gaps re-zeroed
    # before each 3x3 conv — math exactly equals per-crop convs; see
    # models/resnet.py ResNetC4.tail_mosaic). The measured-fastest tail.
    tail_mosaic: bool = False


@dataclass
class DataConfig:
    dataset: str = "refcoco"
    split_by: str = "unc"
    data_root: str = "data"
    image_dir: str = "data/images/train2014"
    # fixed canvas (TPU static shapes). Images are resized per the reference
    # rule (min side -> 600 capped so max side <= 1000), additionally capped
    # to fit the canvas, then zero-padded bottom-right.
    canvas_h: int = 640
    canvas_w: int = 1024
    max_len: int = 10                       # 20 for refcocog
    pixel_means_bgr: Tuple[float, float, float] = (102.9801, 115.9465, 122.7717)
    max_gt_per_image: int = 8               # padded GT slots per image
    # fixed original-resolution buffers for the device-paste eval path
    # (engine/evaluator.py): COCO images are <= 640 per side
    max_orig_h: int = 640
    max_orig_w: int = 640
    # wire formats (host->device transfer is the scarce resource on
    # tunneled TPU setups): ship the canvas as raw uint8 BGR (4x smaller;
    # mean subtraction moves on device; padding uses the rounded pixel
    # means so it lands within 0.25 of the reference's zero-in-subtracted-
    # space padding — below the bf16 compute ulp at pixel scale) and GT
    # masks bit-packed (8x smaller). Set False for bit-strict parity with
    # the reference's float preprocessing.
    wire_uint8_images: bool = True
    wire_packed_masks: bool = True
    # eval wire format: ship each image's GT masks as a REF-DEDUPED bank
    # (gt_mask_bank (R, Hc, Wc) + mask_ref_idx (S,)) instead of one
    # canvas mask per sentence slot — RefCOCO sentences share their
    # ref's mask (~3 sentences/ref), so the bank cuts the largest
    # remaining eval upload after the image itself. The device side
    # expands bank -> per-sentence with an exact one-hot byte matmul
    # (a leading-axis gather at this scale is pathological on TPU).
    # The bank row count pads to s_pad//2 when the image's refs fit
    # (one extra jit specialization per sentence bucket), else s_pad.
    wire_mask_bank: bool = True
    # eval wire format: ship only each image's CONTENT EXTENT (the
    # scaled sh x sw region, rounded up to wire_extent_granularity
    # buckets) and re-inflate to the full canvas on DEVICE in a tiny
    # jitted pad (engine/evaluator.py). Real images rarely fill the
    # (canvas_h, canvas_w) worst-case canvas — a 600x800 image in the
    # 640x1024 canvas is 27% padding bytes — and the upload link, not
    # the chip, bounds eval throughput. Exact under the uint8 canvas
    # contract (padding beyond the extent = rounded pixel means, which
    # is what the loader writes and what the device pad re-creates);
    # ignored for float image wires. Granularity must be a multiple of
    # 8 (bit-packed masks crop at byte boundaries); 128 keeps the
    # device-pad executable set to a handful per run.
    wire_extent_crop: bool = True
    wire_extent_granularity: int = 128
    # REFERENCE-EXACT mask prep: nearest-resize GT masks to the scaled
    # extent through scipy-imresize/PIL semantics (accumulated-float
    # source indexing, gt_mrcn_loader.py:210) instead of the native
    # exact-rational nearest. Boundary pixels differ between the two;
    # pair with Evaluator(reference_exact=True) to reproduce the
    # reference's metric chain bit-for-bit and to bound the deviation
    # (tests/test_ref_exact.py, BASELINE.md).
    reference_exact_masks: bool = False


@dataclass
class ParallelConfig:
    data_axis: str = "data"
    num_data: int = 1                       # data-parallel degree (mesh size)


@dataclass
class Config:
    train: TrainConfig = field(default_factory=TrainConfig)
    test: TestConfig = field(default_factory=TestConfig)
    model: ModelConfig = field(default_factory=ModelConfig)
    data: DataConfig = field(default_factory=DataConfig)
    parallel: ParallelConfig = field(default_factory=ParallelConfig)
    seed: int = 3                           # cfg.RNG_SEED
    exp_dir: str = "output"
    tag: str = "default"

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)


def _set_dotted(obj: Any, key: str, value: Any) -> None:
    parts = key.split(".")
    for p in parts[:-1]:
        obj = getattr(obj, p)
    leaf = parts[-1]
    if not hasattr(obj, leaf):
        raise KeyError(f"unknown config key: {key}")
    old = getattr(obj, leaf)
    # type-checked coercion (parity with reference cfg_from_list type checks)
    if old is not None and not isinstance(value, type(old)):
        if isinstance(old, bool):
            value = str(value).lower() in ("1", "true", "yes")
        elif isinstance(old, int) and not isinstance(old, bool):
            value = int(value)
        elif isinstance(old, float):
            value = float(value)
        elif isinstance(old, tuple):
            value = tuple(value) if isinstance(value, (list, tuple)) else tuple(
                type(old[0])(v) for v in str(value).strip("[]()").split(","))
        elif isinstance(old, str):
            value = str(value)
        else:
            raise TypeError(f"cannot coerce {value!r} to {type(old)} for {key}")
    object.__setattr__(obj, leaf, value)


def apply_overrides(cfg: Config, overrides: List[str]) -> Config:
    """Apply ``["train.learning_rate", "1e-3", ...]`` pair-list overrides
    (semantics of the reference's ``--set`` / cfg_from_list)."""
    assert len(overrides) % 2 == 0, "overrides must be KEY VALUE pairs"
    for k, v in zip(overrides[0::2], overrides[1::2]):
        _set_dotted(cfg, k, v)
    return cfg


def _update_from_dict(obj: Any, d: dict, prefix: str = "") -> None:
    for k, v in d.items():
        if not hasattr(obj, k):
            raise KeyError(f"unknown config key: {prefix}{k}")
        cur = getattr(obj, k)
        if dataclasses.is_dataclass(cur) and isinstance(v, dict):
            _update_from_dict(cur, v, prefix=f"{prefix}{k}.")
        else:
            _set_dotted(obj, k, v)


def load_config(yaml_path: Optional[str] = None,
                overrides: Optional[List[str]] = None) -> Config:
    """Build a Config: defaults <- YAML overlay <- dotted overrides."""
    cfg = Config()
    if yaml_path is not None:
        import yaml
        with open(yaml_path) as f:
            d = yaml.safe_load(f) or {}
        _update_from_dict(cfg, d)
    if overrides:
        apply_overrides(cfg, overrides)
    return cfg
