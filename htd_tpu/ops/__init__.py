from htd_tpu.ops.boxes import (
    bbox2delta,
    delta2bbox,
    bbox_overlaps,
    bbox_flip,
    bbox_mapping,
    bbox_mapping_back,
    clip_boxes,
)
from htd_tpu.ops.anchors import AnchorGenerator
