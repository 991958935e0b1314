"""Voxelization / dynamic scatter ops.

TPU-native replacement for mmcv's CUDA `hard/dynamic_voxelize` and
`dynamic_point_to_voxel` fwd/bwd (reference:
models/data_preprocessors/voxelize.py:17-327): quantize points into a
dense or indexed grid with `jax.ops.segment_*` reductions — the scatter
pattern XLA compiles to efficient sorted-segment kernels; gradients of
the mean/sum reductions come for free (replacing the hand-written
CUDA backward).
"""
from __future__ import annotations

from functools import partial
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=('grid_shape', ))
def dynamic_scatter_3d(points: jnp.ndarray, feats: jnp.ndarray,
                       mask: jnp.ndarray, point_cloud_range: jnp.ndarray,
                       grid_shape: Tuple[int, int, int],
                       reduce: str = 'mean'):
    """Scatter point features into a dense voxel grid.

    Args:
        points: (N, 3); feats: (N, C); mask: (N,).
        point_cloud_range: (6,) [xmin..zmax].
        grid_shape: static (X, Y, Z).
        reduce: 'mean' | 'max' | 'sum'.
    Returns:
        grid (X, Y, Z, C), count (X, Y, Z).
    """
    X, Y, Z = grid_shape
    lo = point_cloud_range[:3]
    hi = point_cloud_range[3:6]
    voxel = (hi - lo) / jnp.asarray([X, Y, Z], jnp.float32)
    q = jnp.floor((points - lo) / voxel).astype(jnp.int32)
    ok = mask & jnp.all((q >= 0) & (q < jnp.asarray([X, Y, Z])), -1)
    idx = (q[:, 0] * Y + q[:, 1]) * Z + q[:, 2]
    idx = jnp.where(ok, idx, X * Y * Z)  # OOB bucket
    n_seg = X * Y * Z + 1
    if reduce == 'max':
        grid = jax.ops.segment_max(jnp.where(ok[:, None], feats, -jnp.inf),
                                   idx, n_seg)
        grid = jnp.where(jnp.isfinite(grid), grid, 0.0)
    else:
        grid = jax.ops.segment_sum(jnp.where(ok[:, None], feats, 0.0), idx,
                                   n_seg)
    count = jax.ops.segment_sum(ok.astype(jnp.float32), idx, n_seg)
    if reduce == 'mean':
        grid = grid / jnp.maximum(count[:, None], 1.0)
    grid = grid[:-1].reshape(X, Y, Z, -1)
    count = count[:-1].reshape(X, Y, Z)
    return grid, count


@partial(jax.jit, static_argnames=('grid_shape', 'max_points'))
def hard_voxelize(points: jnp.ndarray, mask: jnp.ndarray,
                  point_cloud_range: jnp.ndarray,
                  grid_shape: Tuple[int, int, int],
                  max_points: int = 10):
    """VoxelizationByGridShape equivalent: per-voxel first-K points.

    Returns voxel ids per point and a per-point slot index (< max_points
    or -1 when the voxel is full) — enough to build the (V, max_points)
    layout downstream without a CUDA kernel.
    """
    X, Y, Z = grid_shape
    lo = point_cloud_range[:3]
    hi = point_cloud_range[3:6]
    voxel = (hi - lo) / jnp.asarray([X, Y, Z], jnp.float32)
    q = jnp.floor((points - lo) / voxel).astype(jnp.int32)
    ok = mask & jnp.all((q >= 0) & (q < jnp.asarray([X, Y, Z])), -1)
    idx = jnp.where(ok, (q[:, 0] * Y + q[:, 1]) * Z + q[:, 2], -1)
    order = jnp.argsort(jnp.where(ok, idx, jnp.iinfo(jnp.int32).max),
                        stable=True)
    sorted_idx = idx[order]
    first = jnp.concatenate([jnp.asarray([True]),
                             sorted_idx[1:] != sorted_idx[:-1]])
    run_id = jnp.cumsum(first) - 1
    run_start = jax.ops.segment_min(
        jnp.arange(len(order)), run_id, len(order))
    slot_sorted = jnp.arange(len(order)) - run_start[run_id]
    slot = jnp.zeros_like(slot_sorted).at[order].set(slot_sorted)
    slot = jnp.where(ok & (slot < max_points), slot, -1)
    return idx, slot
