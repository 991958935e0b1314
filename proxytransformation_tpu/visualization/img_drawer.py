"""2D image drawer: project 9-DoF boxes into views and draw wireframes
(reference: visualization/img_drawer.py)."""
from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

from .color_selector import ColorMap
from .utils import nine_dof_to_corners, _EDGES


class ImgDrawer:

    def __init__(self, classes: Sequence[str] = ()):
        self.colors = ColorMap(classes)

    def draw_boxes(self, img: np.ndarray, boxes: np.ndarray,
                   proj_mat: np.ndarray,
                   labels: Optional[np.ndarray] = None,
                   thickness: int = 2) -> np.ndarray:
        """Draw projected box wireframes on a BGR image."""
        import cv2
        img = np.ascontiguousarray(np.asarray(img).copy())
        h, w = img.shape[:2]
        corners = nine_dof_to_corners(boxes)  # (M, 8, 3)
        ones = np.ones((*corners.shape[:2], 1), np.float32)
        pts4 = np.concatenate([corners, ones], -1)
        proj = pts4 @ np.asarray(proj_mat, np.float32).T  # (M, 8, 4)
        depth = proj[..., 2]
        uv = proj[..., :2] / np.clip(depth[..., None], 1e-6, None)
        for m in range(len(corners)):
            col = (np.array(self.colors[int(labels[m])]) * 255
                   if labels is not None else (0, 200, 0))
            col = tuple(int(c) for c in np.asarray(col).reshape(-1))[:3]
            for a, b in _EDGES:
                if depth[m, a] <= 0 or depth[m, b] <= 0:
                    continue
                pa = tuple(np.round(uv[m, a]).astype(int))
                pb = tuple(np.round(uv[m, b]).astype(int))
                cv2.line(img, pa, pb, col, thickness)
        return img

    def draw_text(self, img: np.ndarray, text: str,
                  org=(10, 30)) -> np.ndarray:
        import cv2
        img = np.ascontiguousarray(np.asarray(img).copy())
        cv2.putText(img, text, org, cv2.FONT_HERSHEY_SIMPLEX, 0.8,
                    (255, 255, 255), 2)
        return img
