from .rotation import (euler_angles_to_matrix, matrix_to_euler_angles,
                       rotation_3d_in_euler, rotation_3d_in_axis,
                       ortho_6d_to_matrix)
from .boxes import (EulerBoxes, box_corners, bbox_to_corners, box_transform,
                    box_flip, points_in_boxes)
from .projection import points_cam2img, batch_points_cam2img, points_img2cam
from .points import (BasePoints, CameraPoints, DepthPoints, LiDARPoints,
                     get_points_type)
from .iou3d_calculator import (axis_aligned_bbox_overlaps_3d,
                               bbox_overlaps_nearest_3d,
                               BboxOverlapsNearest3D)
from . import box_np_ops
from .transforms import bbox3d_mapping_back, bbox3d2roi, bbox3d2result

__all__ = [
    'bbox3d_mapping_back', 'bbox3d2roi', 'bbox3d2result',
    'euler_angles_to_matrix', 'matrix_to_euler_angles', 'rotation_3d_in_euler',
    'rotation_3d_in_axis', 'ortho_6d_to_matrix', 'EulerBoxes', 'box_corners',
    'bbox_to_corners', 'box_transform', 'box_flip', 'points_in_boxes',
    'points_cam2img', 'batch_points_cam2img', 'points_img2cam',
    'BasePoints', 'CameraPoints', 'DepthPoints', 'LiDARPoints',
    'get_points_type', 'axis_aligned_bbox_overlaps_3d',
    'bbox_overlaps_nearest_3d', 'BboxOverlapsNearest3D', 'box_np_ops'
]
