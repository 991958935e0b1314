"""Occupancy evaluation: per-class IoU + mIoU.

Replicates the reference `OccupancyMetric`
(reference: eval/metrics/occupancy_metric.py:18-178): per-class
intersection/union over dense voxel grids with the 255 ignore label.
"""
from __future__ import annotations

from typing import Dict, Optional, Sequence

import numpy as np

from ..utils.registry import METRICS


@METRICS.register_module()
class OccupancyMetric:

    def __init__(self, num_classes: int = 81, ignore_index: int = 255,
                 empty_label: int = 0, prefix: Optional[str] = None,
                 collect_device: str = 'cpu'):
        self.num_classes = num_classes
        self.ignore_index = ignore_index
        self.empty_label = empty_label
        self.results: list = []

    def process(self, data_batch, data_samples: Sequence[dict]) -> None:
        for ds in data_samples:
            pred = np.asarray(ds['pred_occupancy'])
            gt = np.asarray(ds['gt_occupancy_dense'])
            self.results.append((pred, gt))

    def compute_metrics(self, results=None) -> Dict[str, float]:
        results = results if results is not None else self.results
        inter = np.zeros(self.num_classes)
        union = np.zeros(self.num_classes)
        for pred, gt in results:
            valid = gt != self.ignore_index
            for c in range(self.num_classes):
                p = (pred == c) & valid
                g = (gt == c) & valid
                inter[c] += np.sum(p & g)
                union[c] += np.sum(p | g)
        iou = inter / np.maximum(union, 1)
        present = union > 0
        nonempty = present.copy()
        nonempty[self.empty_label] = False
        out = {f'iou_cls_{c}': float(iou[c])
               for c in range(self.num_classes) if present[c]}
        out['mIoU'] = float(iou[nonempty].mean()) if nonempty.any() else 0.0
        out['IoU_geo'] = float(iou[present].mean()) if present.any() else 0.0
        return out

    def evaluate(self, *_a, **_k):
        ret = self.compute_metrics()
        self.results = []
        return ret
