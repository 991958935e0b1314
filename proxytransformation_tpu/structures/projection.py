"""Camera projection utilities (reference: structures/bbox_3d/utils.py:244-370)."""
from __future__ import annotations

import jax.numpy as jnp


def _expand_proj(proj_mat: jnp.ndarray) -> jnp.ndarray:
    """Expand a (3|4)x(3|4) projection to 4x4."""
    d1, d2 = proj_mat.shape[-2:]
    if (d1, d2) == (4, 4):
        return proj_mat
    out = jnp.zeros(proj_mat.shape[:-2] + (4, 4), proj_mat.dtype)
    out = out.at[..., 3, 3].set(1.0)
    out = out.at[..., :d1, :d2].set(proj_mat)
    return out


def points_cam2img(points: jnp.ndarray,
                   proj_mat: jnp.ndarray,
                   with_depth: bool = False) -> jnp.ndarray:
    """Project (N, 3) camera points to image pixels with a 4x4 matrix."""
    proj_mat = _expand_proj(proj_mat)
    ones = jnp.ones_like(points[..., :1])
    pts4 = jnp.concatenate([points, ones], axis=-1)
    pts2d = jnp.matmul(pts4, proj_mat.T, precision='highest')
    depth = pts2d[..., 2:3]
    uv = pts2d[..., :2] / jnp.where(jnp.abs(depth) < 1e-6,
                                    jnp.sign(depth) * 1e-6 + (depth == 0) * 1e-6,
                                    depth)
    if with_depth:
        return jnp.concatenate([uv, depth], axis=-1)
    return uv


def batch_points_cam2img(points: jnp.ndarray,
                         proj_mats: jnp.ndarray,
                         with_depth: bool = False) -> jnp.ndarray:
    """(V, N, 3) points × (V, 4, 4) projections → (V, N, 2[+1])."""
    proj_mats = _expand_proj(proj_mats)
    ones = jnp.ones_like(points[..., :1])
    pts4 = jnp.concatenate([points, ones], axis=-1)
    pts2d = jnp.einsum('vnk,vjk->vnj', pts4, proj_mats, precision='highest')
    depth = pts2d[..., 2:3]
    safe = jnp.where(jnp.abs(depth) < 1e-6, 1e-6, depth)
    uv = pts2d[..., :2] / safe
    if with_depth:
        return jnp.concatenate([uv, depth], axis=-1)
    return uv


def points_img2cam(uv_depth: jnp.ndarray, cam2img: jnp.ndarray) -> jnp.ndarray:
    """Back-project (N, 3) pixel (u, v, d) to camera frame.

    Matches reference utils.py:336-370 (pinhole, possibly with principal
    point/skew in cam2img).
    """
    cam2img = _expand_proj(cam2img)
    u, v, d = uv_depth[..., 0], uv_depth[..., 1], uv_depth[..., 2]
    fx, fy = cam2img[0, 0], cam2img[1, 1]
    cx, cy = cam2img[0, 2], cam2img[1, 2]
    x = (u - cx) * d / fx
    y = (v - cy) * d / fy
    return jnp.stack([x, y, d], axis=-1)
