"""Multi-view 3D detection model (the pretraining path).

Re-design of the reference `Embodied3DDetector`
(reference: models/detectors/embodied_det3d.py:27-417): ResNet50 image
features + voxelized points → MinkResNet → 2D→3D painting → FCAF3D
head. Training this model produces the detection checkpoint the
grounder warm-starts from (`load_from`, configs/...clip.py:247).
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops.sparse import voxelize_points
from ..utils.registry import MODELS
from .fcaf3d_head import FCAF3DHead, FCAF3DHeadRotMat
from .point_fusion import apply_inverse_aug, batch_point_sample
from .resnet import ResNet
from .sparse_resnet import MinkResNet


@MODELS.register_module()
class Embodied3DDetector(nn.Module):
    voxel_size: float = 0.01
    n_points: int = 100_000
    use_xyz_feat: bool = True
    num_classes: int = 284
    img_base_channels: int = 16
    img_depth: int = 50
    backbone3d_depth: int = 34
    sparse_capacities: Sequence[int] = (100_000, 80_000, 50_000, 20_000,
                                        6_000, 2_000)
    voxel_extent: Sequence[int] = (1280, 1280, 512)
    head_out_channels: int = 128
    pts_prune_threshold: int = 1000
    rot_param: str = 'euler'  # 'ortho6d' for the RotMat head

    def setup(self):
        self.backbone = ResNet(depth=self.img_depth,
                               base_channels=self.img_base_channels)
        self.backbone_3d = MinkResNet(depth=self.backbone3d_depth,
                                      in_channels=3,
                                      capacities=tuple(
                                          self.sparse_capacities))
        img_chans = [self.img_base_channels * 4 * 2 ** i for i in range(4)]
        mink_chans = [64, 128, 256, 512]
        head_cls = (FCAF3DHeadRotMat if self.rot_param == 'ortho6d'
                    else FCAF3DHead)
        self.bbox_head = head_cls(
            num_classes=self.num_classes,
            in_channels=tuple(m + i for m, i in zip(mink_chans, img_chans)),
            out_channels=self.head_out_channels,
            voxel_size=self.voxel_size,
            pts_prune_threshold=self.pts_prune_threshold)

    def extract_feat(self, batch: Dict[str, Any], train: bool):
        imgs = batch['imgs']
        B, V, H, W, _ = imgs.shape
        img_feats = [
            f.reshape((B, V) + f.shape[1:])
            for f in self.backbone(imgs.reshape(B * V, H, W, 3))
        ]
        points, points_mask = batch['points'], batch['points_mask']
        lvl0 = voxelize_points(points, points_mask, points,
                               voxel_size=self.voxel_size,
                               capacity=self.n_points,
                               extent=tuple(self.voxel_extent))
        levels, self_maps = self.backbone_3d(lvl0, train=train,
                                             return_self_maps=True)
        painted = []
        for lvl_idx, lvl in enumerate(levels):
            xyz = lvl.world_xyz()
            inv = jax.vmap(apply_inverse_aug)(
                xyz, batch.get('pcd_rotation'),
                batch.get('pcd_scale_factor'), batch.get('pcd_trans'))
            feat2d = jax.vmap(
                lambda imf, p, proj, vm, vmask: batch_point_sample(
                    imf, p, proj, (H, W), valid_mask=vm, views_mask=vmask,
                    aligned=False))(
                img_feats[lvl_idx], inv, batch['proj_mats'], lvl.mask,
                batch['views_mask'])
            painted.append(
                lvl._replace(feats=jnp.concatenate([lvl.feats, feat2d], -1)))
        return painted, self_maps

    def __call__(self, batch: Dict[str, Any], mode: str = 'predict',
                 train: Optional[bool] = None,
                 axis_name: Optional[str] = None):
        if train is None:
            train = mode == 'loss'
        levels, self_maps = self.extract_feat(batch, train)
        head_outs = self.bbox_head(levels, train=train,
                                   self_maps=self_maps)
        if mode == 'loss':
            return self.bbox_head.loss(head_outs, batch['gt_bboxes'],
                                       batch['gt_labels'],
                                       batch['gt_masks'], axis_name)
        boxes, scores, masks = self.bbox_head.predict(head_outs)
        return {'bboxes_3d': boxes, 'scores_3d': scores, 'mask': masks}
