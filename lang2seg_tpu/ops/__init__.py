from lang2seg_tpu.ops.boxes import (  # noqa: F401
    encode_boxes, decode_boxes, clip_boxes, box_iou,
)
from lang2seg_tpu.ops.anchors import generate_base_anchors, shifted_anchors  # noqa: F401
from lang2seg_tpu.ops.nms import nms_padded  # noqa: F401
from lang2seg_tpu.ops.roi_align import crop_and_resize, roi_crop_pool  # noqa: F401
