from lang2seg_tpu.models.resnet import ResNetC4  # noqa: F401
from lang2seg_tpu.models.lang_encoder import RNNEncoder  # noqa: F401
from lang2seg_tpu.models.dynamic_filter import DynamicFilterGen  # noqa: F401
from lang2seg_tpu.models.heads import RPNHead, BoxHead, MaskHead  # noqa: F401
from lang2seg_tpu.models.network import Lang2Seg  # noqa: F401
