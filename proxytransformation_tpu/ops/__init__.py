from .common import masked_gather, masked_mean, masked_max, masked_softmax
from .ball_query import ball_query
from .fps import sample_farthest_points
from .box3d_overlap import box3d_iou, box3d_intersection_volume
from .hungarian import hungarian_assign, hungarian_assign_dp
from .nms3d import nms3d
from .voxelize import dynamic_scatter_3d, hard_voxelize
from . import sparse

__all__ = [
    'masked_gather', 'masked_mean', 'masked_max', 'masked_softmax',
    'ball_query', 'sample_farthest_points', 'box3d_iou',
    'box3d_intersection_volume', 'hungarian_assign', 'hungarian_assign_dp',
    'nms3d', 'dynamic_scatter_3d', 'hard_voxelize', 'sparse'
]
