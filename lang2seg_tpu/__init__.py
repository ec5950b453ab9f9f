"""lang2seg_tpu — TPU-native referring-expression object segmentation framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
wenz116/lang2seg (BMVC'19 "Referring Expression Object Segmentation with
Caption-Aware Consistency"): a language-conditioned Mask R-CNN whose C4
features are modulated by dynamic filters generated from a referring
expression, trained with detection + mask + response + caption-cycle losses.

Design principles (vs the CUDA/PyTorch reference):
  * everything under ``jit`` — fixed shapes, padded tensors + validity masks
    replace the reference's dynamic per-image shapes and host round-trips
    (reference crossed host/device 4x per step: anchor/proposal targets in
    NumPy, NMS in CUDA FFI, data on host).
  * the reference's per-sentence SGD loop (one optimizer step per referring
    expression, `mask-faster-rcnn/lib/model/train_val.py:350`) becomes the
    batch axis: expressions are batched, images deduplicated, and the
    backbone runs once per unique image instead of once per sentence.
  * scale-out via `jax.sharding.Mesh` + XLA collectives (data-parallel over
    expressions), not NCCL/MPI.
"""

__version__ = "0.1.0"

from lang2seg_tpu.config import Config, load_config  # noqa: F401
