"""Fixed-shape TPU-native ops: the equivalents of `pcdet/ops/*` CUDA extensions.

Pure-JAX reference implementations live in this package; Pallas TPU kernels in
`pdm_ssd_tpu.ops.pallas` override the hot paths and are parity-tested against
these references.
"""
from .pointnet2 import (  # noqa: F401
    farthest_point_sample, gather_operation, ball_query, grouping_operation,
    query_and_group, three_nn, three_interpolate, three_interpolate_weights,
)
from .box_ops import (  # noqa: F401
    rotate_points_along_z, limit_period, boxes_to_corners_3d, enlarge_box3d,
    points_in_boxes, points_in_boxes_batch, mask_points_by_range,
)
from .iou3d import (  # noqa: F401
    boxes_overlap_bev, boxes_iou_bev, boxes_iou3d, boxes_aligned_iou3d, nms_bev,
)
from .coders import ResidualCoder, PointResidualCoder, build_box_coder  # noqa: F401
