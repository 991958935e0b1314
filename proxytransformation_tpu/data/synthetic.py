"""Synthetic grounding dataset for tests, benchmarks and smoke training.

Produces samples with the exact contract of the real pipeline output
(points + multi-view images + text + gt boxes + flags) without needing
the EmbodiedScan data on disk. Scenes contain a few axis-roughly-aligned
boxes of points so that grounding is learnable in principle.
"""
from __future__ import annotations

from typing import Optional

import numpy as np

from ..utils.registry import DATASETS


@DATASETS.register_module()
class SyntheticGroundingDataset:

    def __init__(self, length: int = 32, n_points: int = 4096,
                 n_views: int = 4, img_size: int = 96, n_objects: int = 4,
                 seed: int = 0, test_mode: bool = False):
        self.length = length
        self.n_points = n_points
        self.n_views = n_views
        self.img_size = img_size
        self.n_objects = n_objects
        self.seed = seed
        self.test_mode = test_mode

    def __len__(self):
        return self.length

    def __getitem__(self, idx: int) -> dict:
        rng = np.random.RandomState(self.seed * 100003 + idx)
        S = self.img_size
        # objects: boxes with points concentrated inside
        centers = rng.uniform(0.5, 4.5, (self.n_objects, 3)).astype(np.float32)
        sizes = rng.uniform(0.3, 0.9, (self.n_objects, 3)).astype(np.float32)
        angles = np.stack([
            rng.uniform(-np.pi, np.pi, self.n_objects),
            np.zeros(self.n_objects), np.zeros(self.n_objects)
        ], -1).astype(np.float32)
        boxes = np.concatenate([centers, sizes, angles], -1)

        per_obj = self.n_points // (self.n_objects + 1)
        pts = [rng.uniform(0, 5.0, (self.n_points - self.n_objects * per_obj,
                                    3))]
        for o in range(self.n_objects):
            local = rng.uniform(-0.5, 0.5, (per_obj, 3)) * sizes[o]
            c, s = np.cos(angles[o, 0]), np.sin(angles[o, 0])
            rot = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])
            pts.append(local @ rot.T + centers[o])
        points = np.concatenate(pts).astype(np.float32)

        target = rng.randint(self.n_objects)
        names = ['chair', 'table', 'bed', 'sofa', 'lamp', 'desk', 'shelf',
                 'cabinet']
        name = names[target % len(names)]
        text = f'find the {name} in the room'
        beg = text.find(name)

        imgs = rng.randint(0, 255, (self.n_views, S, S, 3)).astype(np.uint8)
        proj = np.tile(np.array([[S, 0, S / 2, 0], [0, S, S / 2, 0],
                                 [0, 0, 1, 0], [0, 0, 0, 1]], np.float32),
                       (self.n_views, 1, 1))
        gt = boxes[target:target + 1]
        return {
            'points': points,
            'imgs': imgs.astype(np.float32),
            'text': text,
            'tokens_positive': [[[beg, beg + len(name)]]],
            'gt_bboxes_3d': gt,
            'gt_labels_3d': np.asarray([target], np.int64),
            'depth2img': dict(
                intrinsic=[p[:3, :3] for p in proj],
                extrinsic=[np.eye(4, dtype=np.float32)] * self.n_views),
            'scale_factor': None,
            'pcd_rotation': None,
            'pcd_scale_factor': None,
            'pcd_trans': None,
            'eval_ann_info': {
                'gt_bboxes_3d': gt,
                'gt_labels_3d': np.asarray([target], np.int64),
                'is_hard': bool(idx % 3 == 0),
                'is_view_dep': bool(idx % 2 == 0),
                'is_unique': bool(idx % 4 == 0),
            },
        }
