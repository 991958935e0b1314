"""Box result/ROI packaging helpers.

Parity with the reference `structures/ops/transforms.py:1-76`
(`bbox3d_mapping_back`, `bbox3d2roi`, `bbox3d2result`), numpy/JAX-array
based instead of box-object based.
"""
from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np

from .boxes import box_flip


def bbox3d_mapping_back(bboxes: np.ndarray, scale_factor: float,
                        flip_horizontal: bool,
                        flip_vertical: bool) -> np.ndarray:
    """Map (N, 9) boxes from an augmented (test) frame back to the
    original: undo flips, then undo uniform scaling."""
    import jax.numpy as jnp
    b = jnp.asarray(bboxes, jnp.float32)
    if flip_horizontal:
        b = box_flip(b, 'X')
    if flip_vertical:
        b = box_flip(b, 'Y')
    b = jnp.concatenate([b[:, :6] / scale_factor, b[:, 6:]], axis=-1)
    return np.asarray(b)


def bbox3d2roi(bbox_list: Sequence[np.ndarray]) -> np.ndarray:
    """Concatenate per-sample boxes into (M, 1+C) rois with a leading
    batch-index channel."""
    rois = []
    for idx, boxes in enumerate(bbox_list):
        boxes = np.asarray(boxes, np.float32).reshape(len(boxes), -1)
        ind = np.full((len(boxes), 1), idx, np.float32)
        rois.append(np.concatenate([ind, boxes], axis=-1))
    if not rois:
        return np.zeros((0, 10), np.float32)
    return np.concatenate(rois, axis=0)


def bbox3d2result(bboxes: np.ndarray, scores: np.ndarray,
                  labels: np.ndarray,
                  attrs: Optional[np.ndarray] = None) -> Dict:
    """Package one sample's detections into the standard result dict
    (the format the metrics/dumpers consume)."""
    out = {
        'bboxes_3d': np.asarray(bboxes),
        'scores_3d': np.asarray(scores),
        'labels_3d': np.asarray(labels),
    }
    if attrs is not None:
        out['attr_labels'] = np.asarray(attrs)
    return out
