"""Test-time augmentation merging.

Replicates `merge_aug_bboxes_3d` (reference:
models/test_time_augs/merge_augs.py:12-73) and the aug_test flow
(detector :1031-1074): predictions from differently-augmented copies of
one scene are mapped back to the original frame and concatenated; the
merged set is ranked by score (the reference applies no NMS for the
grounding task — scores are concatenated and the metric's top-k does
the selection).
"""
from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np

from ..structures.boxes import box_flip, box_transform
import jax.numpy as jnp


def _undo_aug(boxes: np.ndarray, meta: Dict) -> np.ndarray:
    """Map predicted boxes from an augmented frame back to the original."""
    b = jnp.asarray(boxes, jnp.float32)
    if meta.get('pcd_horizontal_flip'):
        b = box_flip(b, 'X')
    if meta.get('pcd_vertical_flip'):
        b = box_flip(b, 'Y')
    scale = meta.get('pcd_scale_factor')
    if scale:
        b = jnp.concatenate([b[:, :6] / scale, b[:, 6:]], -1)
    angle = meta.get('pcd_rotation_angle')
    if angle:
        c, s = np.cos(-angle), np.sin(-angle)
        rot = np.array([[c, -s, 0, 0], [s, c, 0, 0], [0, 0, 1, 0],
                        [0, 0, 0, 1]], np.float32)
        b = box_transform(b, jnp.asarray(rot))
    return np.asarray(b)


def merge_aug_bboxes_3d(aug_results: List[Dict], aug_metas: List[Dict],
                        test_cfg: Optional[Dict] = None) -> Dict:
    """Merge per-augmentation predictions of a single scene.

    Args:
        aug_results: each {'bboxes_3d': (N, 9), 'scores_3d': (N,)}.
        aug_metas: per-aug meta with the applied transforms.
    Returns:
        {'bboxes_3d', 'scores_3d'} sorted by score descending.
    """
    boxes, scores = [], []
    for res, meta in zip(aug_results, aug_metas):
        b = np.asarray(res['bboxes_3d']).reshape(-1, 9)
        s = np.asarray(res['scores_3d']).reshape(-1)
        boxes.append(_undo_aug(b, meta))
        scores.append(s)
    boxes = np.concatenate(boxes, 0)
    scores = np.concatenate(scores, 0)
    max_num = (test_cfg or {}).get('max_num', len(scores))
    order = np.argsort(-scores)[:max_num]
    return {'bboxes_3d': boxes[order], 'scores_3d': scores[order]}
