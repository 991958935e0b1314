"""2D→3D feature painting: project voxels into views, sample, average.

Replaces the reference's `point_sample` / `batch_point_sample`
(reference: models/layers/fusion_layers/point_fusion.py:110-311) and the
inverse-augmentation replay `apply_3d_transformation` (:20-107).

Semantics preserved: the voxel positions are mapped back through the
inverse of the train-time point augmentation (translate⁻¹ → scale⁻¹ →
rotate⁻¹), projected with `intrinsic @ extrinsic` per view, sampled with
**nearest** interpolation (the grounder calls with aligned=False,
reference detector :442) under grid_sample align_corners=True
coordinate normalization over the padded image shape, and averaged over
the views where the projection is valid (in-bounds, depth > 0).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def apply_inverse_aug(points: jnp.ndarray,
                      pcd_rotation: Optional[jnp.ndarray] = None,
                      pcd_scale_factor: Optional[jnp.ndarray] = None,
                      pcd_trans: Optional[jnp.ndarray] = None,
                      flip_x: Optional[jnp.ndarray] = None,
                      flip_y: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Undo GlobalRotScaleTrans/RandomFlip3D on (N, 3) points.

    `pcd_rotation` is the (3, 3) matrix the aug applied as `p @ R`;
    the inverse replay applies -T, 1/S, then R⁻¹ (reference
    point_fusion.py:59-107, flip last in reverse order).
    """
    p = points
    if flip_x is not None:
        p = p * jnp.where(flip_x, jnp.asarray([-1.0, 1.0, 1.0]), 1.0)
    if flip_y is not None:
        p = p * jnp.where(flip_y, jnp.asarray([1.0, -1.0, 1.0]), 1.0)
    if pcd_trans is not None:
        p = p - pcd_trans
    if pcd_scale_factor is not None:
        p = p / pcd_scale_factor
    if pcd_rotation is not None:
        # aug did p @ R → inverse is p @ R⁻¹ = p @ R.T (rotation)
        p = jnp.matmul(p, jnp.swapaxes(pcd_rotation, -1, -2),
                       precision='highest')
    return p


def batch_point_sample(img_features: jnp.ndarray,
                       points: jnp.ndarray,
                       proj_mats: jnp.ndarray,
                       img_pad_shape,
                       img_scale_factor: Optional[jnp.ndarray] = None,
                       valid_mask: Optional[jnp.ndarray] = None,
                       views_mask: Optional[jnp.ndarray] = None,
                       aligned: bool = False) -> jnp.ndarray:
    """Paint multi-view image features onto 3D points.

    Args:
        img_features: (V, Hf, Wf, C) per-view feature maps (NHWC).
        points: (N, 3) points in the *unaugmented* global frame.
        proj_mats: (V, 4, 4) intrinsic @ extrinsic.
        img_pad_shape: (h, w) padded input-image shape.
        img_scale_factor: optional (2,) (w_scale, h_scale).
        valid_mask: optional (N,) point validity.
        views_mask: optional (V,) view validity.
        aligned: True → bilinear, False → nearest (reference default
            for the grounder path).
    Returns:
        (N, C) mean feature over valid projections (0 where none).
    """
    V, Hf, Wf, C = img_features.shape
    ones = jnp.ones_like(points[:, :1])
    pts4 = jnp.concatenate([points, ones], axis=-1)  # (N, 4)
    proj = jnp.einsum('vij,nj->vni', proj_mats, pts4,
                      precision='highest')  # (V, N, 4)
    depth = proj[..., 2]
    uv = proj[..., :2] / jnp.where(jnp.abs(depth[..., None]) < 1e-6, 1e-6,
                                   depth[..., None])
    if img_scale_factor is not None:
        uv = uv * img_scale_factor
    h, w = img_pad_shape
    x, y = uv[..., 0], uv[..., 1]
    valid = (x > 0) & (x < w) & (y > 0) & (y < h) & (depth > 0)
    if views_mask is not None:
        valid &= views_mask[:, None]

    # grid_sample(align_corners=True) over the padded shape:
    # norm = p / dim * 2 - 1 → feature coords fc = norm_to(0, F-1)
    fx = ((x / w) * 2 - 1 + 1) / 2 * (Wf - 1)
    fy = ((y / h) * 2 - 1 + 1) / 2 * (Hf - 1)

    def gather(ix, iy):
        ix = jnp.clip(ix, 0, Wf - 1)
        iy = jnp.clip(iy, 0, Hf - 1)
        flat = img_features.reshape(V, Hf * Wf, C)
        idx = iy * Wf + ix  # (V, N)
        return jnp.take_along_axis(flat, idx[..., None], axis=1)

    if aligned:
        x0 = jnp.floor(fx).astype(jnp.int32)
        y0 = jnp.floor(fy).astype(jnp.int32)
        dx = (fx - x0)[..., None]
        dy = (fy - y0)[..., None]
        feat = ((1 - dx) * (1 - dy) * gather(x0, y0)
                + dx * (1 - dy) * gather(x0 + 1, y0)
                + (1 - dx) * dy * gather(x0, y0 + 1)
                + dx * dy * gather(x0 + 1, y0 + 1))
    else:
        feat = gather(jnp.round(fx).astype(jnp.int32),
                      jnp.round(fy).astype(jnp.int32))

    feat = jnp.where(valid[..., None], feat, 0.0)  # (V, N, C)
    cnt = jnp.sum(valid, axis=0)  # (N,)
    # view-mean accumulates in f32 (features may flow in bf16), result
    # keeps the feature dtype
    out = (jnp.sum(feat.astype(jnp.float32), axis=0)
           / jnp.clip(cnt[:, None], 1, None)).astype(feat.dtype)
    out = jnp.where((cnt > 0)[:, None], out, 0.0)
    if valid_mask is not None:
        out = jnp.where(valid_mask[:, None], out, 0.0)
    return out
