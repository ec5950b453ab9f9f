from lang2seg_tpu.utils.metrics import (  # noqa: F401
    np_box_iou, recover_masks, SegEvalAccumulator, nearest_resize,
)
from lang2seg_tpu.utils.timer import Timer, timers  # noqa: F401
