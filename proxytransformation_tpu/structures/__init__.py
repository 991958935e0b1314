from .rotation import (euler_angles_to_matrix, matrix_to_euler_angles,
                       rotation_3d_in_euler, rotation_3d_in_axis,
                       ortho_6d_to_matrix)
from .boxes import (EulerBoxes, box_corners, bbox_to_corners, box_transform,
                    box_flip, points_in_boxes)
from .projection import points_cam2img, batch_points_cam2img, points_img2cam

__all__ = [
    'euler_angles_to_matrix', 'matrix_to_euler_angles', 'rotation_3d_in_euler',
    'rotation_3d_in_axis', 'ortho_6d_to_matrix', 'EulerBoxes', 'box_corners',
    'bbox_to_corners', 'box_transform', 'box_flip', 'points_in_boxes',
    'points_cam2img', 'batch_points_cam2img', 'points_img2cam'
]
