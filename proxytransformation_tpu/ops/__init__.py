from .common import masked_gather, masked_mean, masked_max, masked_softmax
from .ball_query import ball_query
from .fps import sample_farthest_points
from .box3d_overlap import box3d_iou, box3d_intersection_volume
from .hungarian import hungarian_assign
from .nms3d import nms3d

__all__ = [
    'masked_gather', 'masked_mean', 'masked_max', 'masked_softmax',
    'ball_query', 'sample_farthest_points', 'box3d_iou',
    'box3d_intersection_volume', 'hungarian_assign', 'nms3d'
]
