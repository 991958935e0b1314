"""Occupancy prediction stack (the EmbodiedScan secondary task).

Re-design of the reference occupancy models (reference:
models/detectors/embodied_occ.py:25-455, dense_fusion_occ.py:26-467,
models/dense_heads/imvoxel_occ_head.py:19-184,
models/necks/imvoxel_neck.py:8-143, losses/occ_loss.py:7-141):

  * `EmbodiedOccPredictor`: multi-view images → 2D backbone → ImVoxelNet
    backprojection onto a dense (X, Y, Z) voxel volume (mean over valid
    views) → 3D conv neck → per-scale occupancy head;
  * `DenseFusionOccPredictor`: additionally splats point features into
    the same volume (dynamic scatter) and fuses;
  * `ImVoxelOccHead`: per-scale 1×1×1 conv → CE(ignore 255) +
    semantic/geometric scene-class affinity losses, 0.5^i scale weights;
  * `occ_multiscale_supervision`: sparse (N, 4) gt → dense grids.

Dense volumes are NXYZC; everything jits with static shapes.
"""
from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops.voxelize import dynamic_scatter_3d
from ..utils.registry import MODELS
from .det_losses import geo_scal_loss, sem_scal_loss
from .point_fusion import batch_point_sample
from .resnet import ResNet


def occ_multiscale_supervision(gt_occ: jnp.ndarray, gt_mask: jnp.ndarray,
                               ratio: int,
                               grid_shape: Tuple[int, int, int],
                               vis_mask: Optional[jnp.ndarray] = None
                               ) -> jnp.ndarray:
    """Sparse (G, 4) [x, y, z, label] gt → dense (X, Y, Z) labels
    (reference occ_loss.py:7-36; 0 = empty, 255 = ignore)."""
    X, Y, Z = grid_shape
    coords = gt_occ[:, :3].astype(jnp.int32) // ratio
    labels = gt_occ[:, 3].astype(jnp.int32)
    ok = gt_mask & jnp.all((coords >= 0)
                           & (coords < jnp.asarray([X, Y, Z])), -1)
    flat = jnp.where(ok, (coords[:, 0] * Y + coords[:, 1]) * Z
                     + coords[:, 2], X * Y * Z)
    dense = jnp.zeros((X * Y * Z + 1, ), jnp.int32)
    dense = dense.at[flat].max(labels, mode='drop')
    dense = dense[:-1].reshape(X, Y, Z)
    if vis_mask is not None:
        dense = jnp.where(vis_mask, dense, 255)
    return dense


class _Conv3dBlock(nn.Module):
    channels: int
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.channels, (3, 3, 3), strides=(self.stride, ) * 3,
                    padding=1, use_bias=False)(x)
        x = nn.BatchNorm(use_running_average=not train)(x)
        return nn.relu(x)


@MODELS.register_module()
class IndoorImVoxelNeck(nn.Module):
    """3D encoder-decoder over the dense volume (reference
    imvoxel_neck.py:8-143): 3 down stages, upsample-add, multi-scale
    outputs fine→coarse."""
    out_channels: int = 128
    n_scales: int = 3

    @nn.compact
    def __call__(self, x, train: bool = False) -> List[jnp.ndarray]:
        # x: (B, X, Y, Z, C)
        downs = []
        h = x
        for i in range(self.n_scales):
            h = _Conv3dBlock(self.out_channels * 2 ** i,
                             stride=1 if i == 0 else 2,
                             name=f'down_{i}')(h, train)
            h = _Conv3dBlock(self.out_channels * 2 ** i,
                             name=f'down_{i}b')(h, train)
            downs.append(h)
        outs = []
        up = None
        for i in range(self.n_scales - 1, -1, -1):
            h = downs[i]
            if up is not None:
                B, X, Y, Z, C = up.shape
                up = jax.image.resize(up, (B, X * 2, Y * 2, Z * 2, C),
                                      'nearest')
                up = nn.Conv(h.shape[-1], (1, 1, 1), name=f'lat_{i}')(up)
                h = h + up
            out = _Conv3dBlock(self.out_channels, name=f'out_{i}')(h, train)
            outs.append(out)
            up = h
        return outs[::-1]  # fine → coarse


@MODELS.register_module()
class ImVoxelOccHead(nn.Module):
    """Per-scale occupancy classifier (reference imvoxel_occ_head.py)."""
    num_classes: int = 81
    use_semantic: bool = True

    @nn.compact
    def __call__(self, mlvl_feats: List[jnp.ndarray]) -> List[jnp.ndarray]:
        out_ch = self.num_classes if self.use_semantic else 1
        return [
            nn.Conv(out_ch, (1, 1, 1), use_bias=False, name=f'occ_{i}')(f)
            for i, f in enumerate(mlvl_feats)
        ]

    def loss(self, occ_preds: List[jnp.ndarray], gt_occ: jnp.ndarray,
             gt_mask: jnp.ndarray,
             vis_masks: Optional[jnp.ndarray] = None) -> Dict:
        losses = {}
        for i, pred in enumerate(occ_preds):
            ratio = 2 ** i
            B = pred.shape[0]
            grid_shape = pred.shape[1:4]

            def per_sample(p, g, m):
                gt = occ_multiscale_supervision(g, m, ratio, grid_shape)
                valid = gt != 255
                if self.use_semantic:
                    logp = jax.nn.log_softmax(p, -1)
                    safe_gt = jnp.clip(gt, 0, self.num_classes - 1)
                    ce = -jnp.take_along_axis(
                        logp, safe_gt[..., None], -1)[..., 0]
                    ce = jnp.sum(ce * valid) / jnp.maximum(
                        jnp.sum(valid), 1.0)
                    return (ce + sem_scal_loss(p, gt, valid)
                            + geo_scal_loss(p, gt, 0, valid))
                occ = (gt > 0).astype(p.dtype)
                bce = jnp.clip(p[..., 0], 0, None) - p[..., 0] * occ + \
                    jnp.log1p(jnp.exp(-jnp.abs(p[..., 0])))
                return jnp.sum(bce * valid) / jnp.maximum(
                    jnp.sum(valid), 1.0)

            li = jnp.mean(jax.vmap(per_sample)(pred, gt_occ, gt_mask))
            losses[f'loss_occ_{i}'] = li * (0.5 ** i)
        return losses

    def predict(self, occ_preds: List[jnp.ndarray]) -> jnp.ndarray:
        pred = occ_preds[0]
        if self.use_semantic:
            return jnp.argmax(pred, -1)
        return jax.nn.sigmoid(pred[..., 0])


@MODELS.register_module()
class EmbodiedOccPredictor(nn.Module):
    """ImVoxelNet-style occupancy predictor (reference
    embodied_occ.py:25-455)."""
    n_voxels: Sequence[int] = (40, 40, 16)
    voxel_range: Sequence[float] = (-3.2, -3.2, -0.78, 3.2, 3.2, 1.78)
    num_classes: int = 81
    img_base_channels: int = 16
    img_depth: int = 50
    neck_channels: int = 64
    use_semantic: bool = True
    fuse_points: bool = False  # True = DenseFusionOccPredictor

    def setup(self):
        self.backbone = ResNet(depth=self.img_depth,
                               base_channels=self.img_base_channels)
        self.feat_proj = nn.Dense(self.neck_channels)
        self.neck_3d = IndoorImVoxelNeck(out_channels=self.neck_channels)
        self.bbox_head = ImVoxelOccHead(num_classes=self.num_classes,
                                        use_semantic=self.use_semantic)
        if self.fuse_points:
            self.point_proj = nn.Dense(self.neck_channels)

    def _voxel_centers(self):
        X, Y, Z = self.n_voxels
        r = jnp.asarray(self.voxel_range)
        vx = (r[3:] - r[:3]) / jnp.asarray([X, Y, Z], jnp.float32)
        ix, iy, iz = jnp.meshgrid(jnp.arange(X), jnp.arange(Y),
                                  jnp.arange(Z), indexing='ij')
        centers = jnp.stack([ix, iy, iz], -1).astype(jnp.float32)
        return r[:3] + (centers + 0.5) * vx  # (X, Y, Z, 3)

    def extract_feat(self, batch: Dict[str, Any], train: bool):
        imgs = batch['imgs']
        B, V, H, W, _ = imgs.shape
        feats = self.backbone(imgs.reshape(B * V, H, W, 3))[0]
        feats = self.feat_proj(feats)
        feats = feats.reshape((B, V) + feats.shape[1:])
        centers = self._voxel_centers()
        X, Y, Z, _ = centers.shape
        pts = centers.reshape(-1, 3)

        def per_sample(imf, proj, vmask):
            return batch_point_sample(imf, pts, proj, (H, W),
                                      views_mask=vmask, aligned=True)

        vol = jax.vmap(per_sample)(feats, batch['proj_mats'],
                                   batch['views_mask'])
        vol = vol.reshape(B, X, Y, Z, -1)
        if self.fuse_points:
            def splat(p, f, m):
                grid, _ = dynamic_scatter_3d(
                    p, f, m, jnp.asarray(self.voxel_range),
                    tuple(self.n_voxels))
                return grid

            pgrid = jax.vmap(splat)(batch['points'],
                                    self.point_proj(batch['points']),
                                    batch['points_mask'])
            vol = vol + pgrid
        return self.neck_3d(vol, train)

    def __call__(self, batch: Dict[str, Any], mode: str = 'predict',
                 train: Optional[bool] = None):
        if train is None:
            train = mode == 'loss'
        mlvl = self.extract_feat(batch, train)
        occ_preds = self.bbox_head(mlvl)
        if mode == 'loss':
            return self.bbox_head.loss(occ_preds, batch['gt_occupancy'],
                                       batch['gt_occupancy_masks'])
        return {'occupancy': self.bbox_head.predict(occ_preds)}


@MODELS.register_module()
class DenseFusionOccPredictor(EmbodiedOccPredictor):
    """Point-fused variant (reference dense_fusion_occ.py:26-467)."""
    fuse_points: bool = True
