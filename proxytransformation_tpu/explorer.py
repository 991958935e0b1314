"""Interactive dataset explorer.

Re-design of the reference `EmbodiedScanExplorer` (reference:
explorer.py:17-501): list scenes, inspect annotations, count
categories, and render scenes/occupancy through the visualizer — all
headless-friendly (matplotlib/PLY fallbacks when open3d is absent).
"""
from __future__ import annotations

import pickle
from collections import Counter
from typing import Dict, List, Optional, Sequence

import numpy as np

from .data.categories import EMBODIEDSCAN_CLASSES
from .visualization.base_visualizer import EmbodiedScanBaseVisualizer


class EmbodiedScanExplorer:

    def __init__(self, data_root: str = '', ann_files: Sequence[str] = (),
                 verbose: bool = False, save_dir: str = './viz'):
        self.data_root = data_root
        self.verbose = verbose
        self.classes = list(EMBODIEDSCAN_CLASSES)
        self.visualizer = EmbodiedScanBaseVisualizer(self.classes, save_dir)
        self.data: List[dict] = []
        for path in ann_files:
            with open(path, 'rb') as f:
                ann = pickle.load(f)
            self.data.extend(ann.get('data_list', []))
        if 'categories' in (ann.get('metainfo', {}) if ann_files else {}):
            self.cat2label = ann['metainfo']['categories']
        else:
            self.cat2label = {c: i for i, c in enumerate(self.classes)}
        self.label2cat = {v: k for k, v in self.cat2label.items()}

    # ------------------------------------------------------------------
    def list_scenes(self) -> List[str]:
        return [d.get('sample_idx', str(i)) for i, d in enumerate(self.data)]

    def count_scenes(self) -> int:
        return len(self.data)

    def scene_info(self, scene_id: str) -> Optional[dict]:
        for d in self.data:
            if d.get('sample_idx') == scene_id:
                n_imgs = len(d.get('images', []))
                n_inst = len(d.get('instances', []))
                cats = Counter(
                    self.label2cat.get(i.get('bbox_label_3d'), '?')
                    for i in d.get('instances', []))
                return {'scan_id': scene_id, 'num_images': n_imgs,
                        'num_instances': n_inst, 'categories': dict(cats)}
        return None

    def category_statistics(self) -> Dict[str, int]:
        counts: Counter = Counter()
        for d in self.data:
            for inst in d.get('instances', []):
                counts[self.label2cat.get(inst.get('bbox_label_3d'),
                                          '?')] += 1
        return dict(counts.most_common())

    # ------------------------------------------------------------------
    def render_scene(self, scene_id: str, points: np.ndarray,
                     show: bool = False) -> Optional[str]:
        """Render a scene's points + annotated boxes."""
        for d in self.data:
            if d.get('sample_idx') == scene_id:
                boxes = np.asarray([
                    inst['bbox_3d'] for inst in d.get('instances', [])
                ], np.float32).reshape(-1, 9)
                labels = np.asarray([
                    inst.get('bbox_label_3d', 0)
                    for inst in d.get('instances', [])
                ], np.int64)
                return self.visualizer.visualize_scene(
                    points, boxes, labels, name=scene_id.replace('/', '_'),
                    show=show)
        return None

    def render_occupancy(self, occ: np.ndarray, name: str = 'occ'):
        """Render a dense (X, Y, Z) occupancy grid as colored voxels."""
        idx = np.stack(np.nonzero(occ > 0), -1).astype(np.float32)
        if len(idx) == 0:
            return None
        labels = occ[occ > 0].reshape(-1)
        colors = np.stack([
            np.asarray(self.visualizer.colors[int(l)]) * 255 for l in labels
        ])
        pts = np.concatenate([idx, colors], -1)
        return self.visualizer.visualize_scene(pts, name=name)
