"""TPU-native sparse 3D voxel engine (MinkowskiEngine replacement).

Replaces the reference's MinkowskiEngine C++/CUDA stack — SparseTensor
coordinate hashmaps, MinkowskiConvolution, GenerativeConvolutionTranspose,
MaxPooling, Pruning, batch_sparse_collate (reference:
embodiedscan/models/backbones/mink_resnet.py:58-124,
models/necks/mink_neck.py:72-214, detector collate
models/detectors/sparse_featfusion_grounder_preshape.py:388-397).

TPU-first design — no hashmaps, no dynamic shapes:
  * a level is a capacity-bounded set of voxels per sample: int32
    linearized coordinate keys kept **sorted ascending** (invalid slots
    hold an INT32_MAX sentinel so binary search stays valid), raw int
    coords, features, and a validity mask;
  * "hash lookup" becomes `searchsorted` over the sorted keys — built
    ONCE per level-pair into a (V_out, K³) neighbor map and reused by
    every convolution on that pair;
  * convolution is a `lax.scan` over kernel offsets of gather → matmul,
    i.e. K³ dense (V, C_in)@(C_in, C_out) MXU matmuls with miss-masking.
    (Measured: XLA row gathers run at ~33 GB/s on v5e, and Mosaic's
    `tpu.dynamic_gather` cannot cross vregs, so a Pallas gather-fused
    conv is not expressible; the next-level design is a 2×2×2 brick
    format that amortizes one gather over 8 voxels — future work.);
  * stride-2 downsampling / pooling coordinate maps come from
    sort + unique-run compaction (cumsum positions, scatter-to-prefix);
  * pruning is a masked top-k over scores — the arrays stay put, only
    the mask shrinks.

Coordinates are per-sample (origin at the sample's AABB min), in units
of the current level's stride, bounded by `extent` (default 1280×1280×512
at the finest level — 12.8 m × 12.8 m × 5.12 m at 1 cm, ample for indoor
scans); out-of-extent points are dropped via the mask.
"""
from __future__ import annotations

import dataclasses
import functools
import os
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

SENTINEL = jnp.int32(2**31 - 1)

Extent = Tuple[int, int, int]
DEFAULT_EXTENT: Extent = (1280, 1280, 512)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class SparseLevel:
    """One resolution level of a batched sparse voxel grid.

    keys:   (B, V) int32 — linearized coords, sorted ascending per
            sample; invalid slots = SENTINEL (sorted to the end).
    coords: (B, V, 3) int32 — integer coords in this level's units.
    feats:  (B, V, C) float — voxel features (0 at invalid slots).
    mask:   (B, V) bool — validity.
    origin: (B, 3) float — world position of integer coord (0,0,0).
    extent: static (Ex, Ey, Ez) of this level's grid.
    stride: static int — this level's stride in finest-level units.
    voxel_size: static float — finest-level voxel edge in meters.
    """
    keys: jnp.ndarray
    coords: jnp.ndarray
    feats: jnp.ndarray
    mask: jnp.ndarray
    origin: jnp.ndarray
    extent: Extent = DEFAULT_EXTENT
    stride: int = 1
    voxel_size: float = 0.01

    def tree_flatten(self):
        return ((self.keys, self.coords, self.feats, self.mask,
                 self.origin),
                (self.extent, self.stride, self.voxel_size))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)

    def _replace(self, **kw):
        return dataclasses.replace(self, **kw)

    @property
    def capacity(self) -> int:
        return self.keys.shape[1]

    def num_valid(self) -> jnp.ndarray:
        return jnp.sum(self.mask, axis=1)

    def world_xyz(self) -> jnp.ndarray:
        """(B, V, 3) world-frame voxel positions (0 at invalid slots).

        Equivalent of `decomposed_coordinates * voxel_size` in the
        reference (mink_neck.py:210-213).
        """
        xyz = (self.origin[:, None, :]
               + self.coords.astype(jnp.float32)
               * (self.stride * self.voxel_size))
        return jnp.where(self.mask[..., None], xyz, 0.0)


def linearize(coords: jnp.ndarray, extent: Extent) -> jnp.ndarray:
    """(…, 3) int coords → int32 keys. Caller guarantees in-extent."""
    ex, ey, ez = extent
    assert ex * ey * ez < 2**31, f'extent {extent} overflows int32 keys'
    c = coords.astype(jnp.int32)
    return (c[..., 0] * ey + c[..., 1]) * ez + c[..., 2]


def _compact_unique(keys: jnp.ndarray, order_payload: jnp.ndarray,
                    valid: jnp.ndarray, capacity: int):
    """Sorted keys → first-occurrence unique, compacted to `capacity`.

    Args:
        keys: (N,) int32 sorted ascending (invalid = SENTINEL).
        order_payload: (N,) int32 payload (e.g. source index) aligned
            with keys; the FIRST payload of each run is kept (this is
            the deterministic stand-in for ME's per-voxel subsample).
        valid: (N,) bool.
    Returns:
        out_keys (capacity,), out_payload (capacity,), out_mask.
        Output stays sorted ascending.
    """
    prev = jnp.concatenate([jnp.full((1, ), -1, jnp.int32), keys[:-1]])
    is_first = valid & (keys != prev)
    pos = jnp.cumsum(is_first.astype(jnp.int32)) - 1
    write = is_first & (pos < capacity)
    slot = jnp.where(write, pos, capacity)
    out_keys = jnp.full((capacity, ), SENTINEL,
                        jnp.int32).at[slot].set(keys, mode='drop')
    out_payload = jnp.zeros((capacity, ), order_payload.dtype).at[slot].set(
        order_payload, mode='drop')
    out_mask = jnp.zeros((capacity, ), bool).at[slot].set(True, mode='drop')
    return out_keys, out_payload, out_mask


def _delinearize(keys: jnp.ndarray, extent: Extent) -> jnp.ndarray:
    ex, ey, ez = extent
    z = keys % ez
    y = (keys // ez) % ey
    x = keys // (ey * ez)
    return jnp.stack([x, y, z], axis=-1).astype(jnp.int32)


# --------------------------------------------------------------------------
# voxelization (points → finest level)
# --------------------------------------------------------------------------
@functools.partial(jax.jit,
                   static_argnames=('voxel_size', 'capacity', 'extent'))
def voxelize_points(points: jnp.ndarray,
                    mask: jnp.ndarray,
                    feats: jnp.ndarray,
                    voxel_size: float,
                    capacity: int,
                    extent: Extent = DEFAULT_EXTENT) -> SparseLevel:
    """Quantize padded point clouds into the finest sparse level.

    Mirrors `ME.utils.batch_sparse_collate` + `ME.SparseTensor`
    (reference detector :388-397): floor-quantize at `voxel_size`,
    keep one representative point's features per occupied voxel
    (deterministic first-in-order instead of ME's random subsample).

    Args:
        points: (B, N, 3) float (meters).
        mask: (B, N) bool.
        feats: (B, N, C) per-point features (e.g. the points themselves
            when use_xyz_feat=True).
    """
    B, N, _ = points.shape
    origin = jnp.min(jnp.where(mask[..., None], points, 1e9), axis=1,
                     keepdims=True)  # (B, 1, 3)
    q = jnp.floor((points - origin) / voxel_size).astype(jnp.int32)
    ext = jnp.asarray(extent, jnp.int32)
    in_bounds = jnp.all((q >= 0) & (q < ext), axis=-1) & mask
    keys = jnp.where(in_bounds, linearize(q, extent), SENTINEL)

    def per_sample(k, f):
        order = jnp.argsort(k, stable=True)  # invalid (SENTINEL) last
        k_sorted = k[order]
        src = order.astype(jnp.int32)
        ok, payload, om = _compact_unique(k_sorted, src,
                                          k_sorted != SENTINEL, capacity)
        of = jnp.where(om[:, None], f[payload], 0.0)
        return ok, payload, om, of

    out_keys, payload, out_mask, out_feats = jax.vmap(per_sample)(keys, feats)
    coords = jnp.where(out_mask[..., None], _delinearize(out_keys, extent), 0)
    return SparseLevel(out_keys, coords, out_feats, out_mask, origin[:, 0],
                       extent, 1, voxel_size)


# --------------------------------------------------------------------------
# coordinate maps
# --------------------------------------------------------------------------
def _shrink_extent(extent: Extent, factor: int = 2) -> Extent:
    return tuple(-(-e // factor) for e in extent)


@functools.partial(jax.jit, static_argnames=('capacity', ))
def downsample_coords(level: SparseLevel, capacity: int) -> SparseLevel:
    """Stride-2 output coordinate map: unique(floor(coords / 2)).

    Matches ME's strided output map. Features are zero-initialised —
    the conv fills them in.
    """
    new_extent = _shrink_extent(level.extent)
    parent = level.coords // 2
    pkeys = jnp.where(level.mask, linearize(parent, new_extent), SENTINEL)

    def per_sample(k):
        order = jnp.argsort(k, stable=True)
        ks = k[order]
        ok, _, om = _compact_unique(ks, jnp.zeros_like(ks),
                                    ks != SENTINEL, capacity)
        return ok, om

    out_keys, out_mask = jax.vmap(per_sample)(pkeys)
    coords = jnp.where(out_mask[..., None],
                       _delinearize(out_keys, new_extent), 0)
    feats = jnp.zeros((level.keys.shape[0], capacity, 1), level.feats.dtype)
    return SparseLevel(out_keys, coords, feats, out_mask, level.origin,
                       new_extent, level.stride * 2, level.voxel_size)


def kernel_offsets(kernel_size: int) -> np.ndarray:
    """Integer kernel offsets, ME convention: odd → centered, even → [0, k)."""
    if kernel_size % 2 == 1:
        r = np.arange(kernel_size) - kernel_size // 2
    else:
        r = np.arange(kernel_size)
    g = np.stack(np.meshgrid(r, r, r, indexing='ij'), -1).reshape(-1, 3)
    return g.astype(np.int32)


@functools.partial(jax.jit, static_argnames=('kernel_size', 'stride'))
def build_neighbor_map(in_level: SparseLevel, out_level: SparseLevel,
                       kernel_size: int, stride: int) -> jnp.ndarray:
    """Neighbor map: for each output voxel and kernel offset, the index
    of the corresponding input voxel (or -1).

    Built once per (in, out) level pair and shared by every conv on
    that pair — this replaces ME's coordinate-manager kernel maps.

    The z kernel axis is folded out of the sort-join: the kz offsets of
    one (dx, dy) column are CONSECUTIVE integers in linearized key
    space, so one lower-bound per column plus kz local candidate reads
    answers all kz queries — the join sorts V + K²·V_out elements
    instead of V + K³·V_out (2.8× less sort work for K=3, the dominant
    cost of this engine on TPU).

    Returns: (B, V_out, K³) int32 (z fastest, matching kernel_offsets).
    """
    B = out_level.keys.shape[0]
    offs = kernel_offsets(kernel_size)          # (K3, 3), z fastest
    ks = kernel_size
    kz = ks
    k2 = ks * ks
    offs_xy = jnp.asarray(offs.reshape(k2, kz, 3)[:, 0, :2])  # (K2, 2)
    zoffs = offs.reshape(k2, kz, 3)[0, :, 2]     # e.g. [-1, 0, 1] / [0, 1]

    base = out_level.coords * stride             # (B, V_out, 3)
    ex, ey, ez = in_level.extent
    # one query per (dx, dy) column at the CENTER z (z offset 0 exists
    # for both odd and even kernels in ME convention)
    cxy = base[:, :, None, :2] + offs_xy[None, None]   # (B, V_out, K2, 2)
    zc = base[:, :, None, 2]                           # (B, V_out, K2)
    xy_ok = jnp.all((cxy >= 0) & (cxy < jnp.asarray((ex, ey))), axis=-1)
    qc = ((cxy[..., 0] * ey + cxy[..., 1]) * ez + zc).astype(jnp.int32)
    qc = jnp.where(xy_ok & out_level.mask[:, :, None], qc, SENTINEL)

    # column-major query layout: each run of consecutive queries is one
    # (dx, dy) column over consecutive (sorted) output voxels, so a
    # merge-join tile's key window is a single narrow x-slab instead of
    # the union of all K² column offsets (order is irrelevant to the
    # XLA sort-join fallback)
    qc_t = jnp.swapaxes(qc, 1, 2)                # (B, K2, V_out)
    im, ic, ip = lookup_pmz(in_level.keys, qc_t.reshape(B, -1))
    untr = lambda a: jnp.swapaxes(a.reshape(qc_t.shape), 1, 2)
    by_dz = {-1: untr(im), 0: untr(ic), 1: untr(ip)}

    parts = []
    for j in range(kz):
        dz = int(zoffs[j])
        z_j = zc + dz
        valid = (z_j >= 0) & (z_j < ez)
        parts.append(jnp.where(valid, by_dz[dz], -1))
    nbr = jnp.stack(parts, axis=-1)              # (B, V_out, K2, kz)
    nbr = nbr.reshape(B, base.shape[1], k2 * kz)
    return jnp.where(out_level.mask[:, :, None], nbr, -1)


def lookup_pmz(keys: jnp.ndarray, queries: jnp.ndarray
               ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(q-1, q, q+1) index lookup with backend dispatch.

    On TPU: the Pallas merge-join stream (ops/merge_join_pallas.py) —
    both sides are already sorted, so the join is a windowed linear
    merge at compare bandwidth instead of O(n log² n) bitonic passes.
    CPU falls back to the XLA sort-join."""
    if jax.default_backend() not in ('cpu', ):
        from .merge_join_pallas import lookup_pmz_stream
        return lookup_pmz_stream(keys, queries)
    return _batched_lookup_pmz(keys, queries)


def lookup_center(keys: jnp.ndarray, queries: jnp.ndarray) -> jnp.ndarray:
    """Exact-match index lookup with backend dispatch (see lookup_pmz)."""
    if jax.default_backend() not in ('cpu', ):
        from .merge_join_pallas import lookup_stream
        return lookup_stream(keys, queries)
    return _batched_lookup(keys, queries)


def _batched_lookup(keys: jnp.ndarray, queries: jnp.ndarray) -> jnp.ndarray:
    """Find each query in per-sample sorted key arrays: (B, V), (B, Q) →
    (B, Q) int32 index or -1.

    TPU-first sort-join with ZERO random memory accesses (XLA's TPU
    gather lowering makes binary search ~100× slower than it should be):
      1. sort the concatenated (keys ⊕ queries) by (value, origin-tag) —
         keys sort before equal-valued queries;
      2. forward-fill the last-seen key's value and index with two
         cummax scans (both are monotone by construction);
      3. un-sort with a second sort keyed on the origin tag, whose
         query segment comes back in original order.
    Sorts and scans are fully vectorized on TPU; no gathers/scatters.
    """
    B, V = keys.shape
    Q = queries.shape[1]
    vals = jnp.concatenate([keys, queries.astype(jnp.int32)], axis=1)
    tags = jnp.broadcast_to(
        jnp.arange(V + Q, dtype=jnp.int32)[None], (B, V + Q))
    # sort by (value, tag): stable; key rows (tag < V) precede queries
    sval, stag = jax.lax.sort((vals, tags), dimension=1, num_keys=2)
    is_key = stag < V
    INT_MIN = jnp.int32(-2**31 + 1)
    last_key_idx = jax.lax.cummax(jnp.where(is_key, stag, -1), axis=1)
    last_key_val = jax.lax.cummax(jnp.where(is_key, sval, INT_MIN), axis=1)
    match = (~is_key) & (last_key_val == sval) & (sval != SENTINEL)
    result_sorted = jnp.where(match, last_key_idx, -1)
    # un-sort: order by tag; entries V.. are the queries in input order
    _, result = jax.lax.sort((stag, result_sorted), dimension=1, num_keys=1)
    return result[:, V:]


def _batched_lookup_pmz(keys: jnp.ndarray, queries: jnp.ndarray
                        ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Find q-1, q, q+1 for each query in ONE sort-join, no gathers.

    Answers three consecutive key values per query — exactly the z
    kernel column of a 3³ neighborhood (z is the fastest-varying axis
    of the linearized keys, so the column's keys are consecutive ints):
      * q   : the last key ≤ q (forward scan) equals q;
      * q-1 : the last key ≤ q equals q-1, OR the SECOND-last key does
              (when q itself is present) — tracked by a top-2
              associative scan;
      * q+1 : the first key > q (reverse cummin) equals q+1.
    Every step is a sort or an elementwise scan — zero random memory
    accesses (XLA's TPU gather runs ~50× below HBM speed; measured
    27 ms for 27·V_out index loads at V=50k, the cost this removes).

    Args:
        keys: (B, V) int32 sorted ascending, SENTINEL-padded, unique
            among valid entries.
        queries: (B, Q) int32, SENTINEL = skip.
    Returns:
        (idx_minus, idx_center, idx_plus): (B, Q) int32 each, -1 = miss.
    """
    B, V = keys.shape
    Q = queries.shape[1]
    INT_MIN = jnp.int32(-2**31 + 1)
    INT_MAX = SENTINEL
    vals = jnp.concatenate([keys, queries.astype(jnp.int32)], axis=1)
    tags = jnp.broadcast_to(
        jnp.arange(V + Q, dtype=jnp.int32)[None], (B, V + Q))
    sval, stag = jax.lax.sort((vals, tags), dimension=1, num_keys=2)
    is_key = stag < V

    # forward: (index, value) of the last TWO keys seen. Keys appear in
    # increasing index order (the key array is itself sorted), so
    # "last two seen" == "two largest indices so far".
    kpos = jnp.where(is_key, stag, -1)
    kval = jnp.where(is_key, sval, INT_MIN)

    def comb(a, b):
        p1a, v1a, p2a, v2a = a
        p1b, v1b, p2b, v2b = b
        ta = p1a > p1b
        P1 = jnp.where(ta, p1a, p1b)
        V1 = jnp.where(ta, v1a, v1b)
        lo_p = jnp.where(ta, p1b, p1a)   # loser of the top-1 contest
        lo_v = jnp.where(ta, v1b, v1a)
        tb = p2a > p2b
        s_p = jnp.where(tb, p2a, p2b)
        s_v = jnp.where(tb, v2a, v2b)
        t2 = lo_p > s_p
        P2 = jnp.where(t2, lo_p, s_p)
        V2 = jnp.where(t2, lo_v, s_v)
        return P1, V1, P2, V2

    p1, v1, p2, v2 = jax.lax.associative_scan(
        comb, (kpos, kval, jnp.full_like(kpos, -1),
               jnp.full_like(kval, INT_MIN)), axis=1)

    # reverse: (index, value) of the FIRST key after each position —
    # among following keys the nearest one has both the min value and
    # the min index, so two flipped cummins suffice.
    nval = jnp.flip(jax.lax.cummin(
        jnp.flip(jnp.where(is_key, sval, INT_MAX), axis=1), axis=1), axis=1)
    nidx = jnp.flip(jax.lax.cummin(
        jnp.flip(jnp.where(is_key, stag, INT_MAX), axis=1), axis=1), axis=1)

    live = (~is_key) & (sval != SENTINEL)
    r0 = jnp.where(live & (v1 == sval), p1, -1)
    rm = jnp.where(live & (v1 == sval - 1), p1,
                   jnp.where(live & (v2 == sval - 1), p2, -1))
    rp = jnp.where(live & (nval == sval + 1), nidx, -1)

    _, om, oc, op = jax.lax.sort((stag, rm, r0, rp), dimension=1,
                                 num_keys=1)
    return om[:, V:], oc[:, V:], op[:, V:]


# --------------------------------------------------------------------------
# compute primitives
# --------------------------------------------------------------------------
def sparse_conv(feats: jnp.ndarray, nbr: jnp.ndarray, weights: jnp.ndarray,
                out_mask: jnp.ndarray, self_map: bool = False) -> jnp.ndarray:
    """Sparse conv with backend dispatch.

    On TPU, every K³>1 convolution uses the Pallas monotone-window
    gather-GEMM kernel (ops/sparse_conv_pallas.py): ANY map produced by
    `build_neighbor_map` is monotone per offset — output keys are
    sorted, so each offset's query keys are sorted, so hit indices into
    the sorted input are non-decreasing (stride only scales the query
    spacing). Measured 1.6× over the XLA gather-scan on both self and
    strided model shapes. CPU falls back to the XLA path.

    Gradients: for SELF maps dfeats is itself a Pallas conv with the
    REVERSED map and transposed weights (out v reads in j at offset k
    ⟺ out j reads in v at offset −k, and kernel_offsets is symmetric
    under index reversal) — no scatter-add anywhere. dW and the strided
    dfeats use the XLA gather/scatter formulation.
    """
    if (nbr.shape[-1] > 1
            and jax.default_backend() not in ('cpu', )):
        # non-CPU == the TPU here (the axon plugin reports its own
        # platform name, so match ball_query.py's backend check)
        return _sparse_conv_pallas_ad(self_map, feats, nbr, weights,
                                      out_mask)
    return sparse_conv_apply(feats, nbr, weights, out_mask)


# column-window (tile, chunk) tuned per channel width on v5e (2026-08
# scan over tile {128,256,512} x chunk {256,512} at real model/neck
# shapes, BASELINE.md): C_in<=128 -> (256, 512); C_in==256 -> (128,
# 256) — 2.8x over (256, 256) at the 20k-voxel stage; C_in>=512 ->
# (256, 512); C_in>=1024 (brick-format stages: 8x128 packed channels)
# -> (128, 256): the (256, 512) setting's scratch+weight block is 132 KB
# over the 16 MB scoped-vmem limit at 1024x1024 weights
def _colwin_params(c_in: int):
    if c_in == 256:
        return 128, 256
    if c_in >= 1024:
        return 128, 256
    return 256, 512


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, ))
def _sparse_conv_pallas_ad(self_map, feats, nbr, weights, out_mask):
    from .sparse_conv_pallas import sparse_conv_gather_gemm_colwin
    tile, chunk = _colwin_params(feats.shape[-1])
    return sparse_conv_gather_gemm_colwin(
        feats, nbr, weights, out_mask, tile=tile, chunk=chunk)


def _sparse_conv_pallas_fwd(self_map, feats, nbr, weights, out_mask):
    return (_sparse_conv_pallas_ad(self_map, feats, nbr, weights,
                                   out_mask),
            (feats, nbr, weights, out_mask))


def _sparse_conv_pallas_bwd(self_map, res, g):
    """Both gradients as Pallas gather-GEMM passes — no XLA row
    gathers or scatter-adds anywhere in the conv backward.

    dW: one `sparse_conv_dw_gather_gemm` pass (the transposed problem
    shares the forward's monotone union windows).

    dfeats, self maps: a conv over the SAME map with mirrored-
    transposed weights — dfeats[j] = Σ_k W[k]ᵀ g[v : nbr[v,k]=j], and
    with m = mirror(k) (kernel_offsets is symmetric under index
    reversal) the source is nbr[j, m] itself.

    dfeats, strided maps: a conv over the REVERSED map. For each
    offset k, v ↦ nbr[v,k] is injective, so the inverse map
    rnbr[j,k] = v (one int32 scatter) is well-defined and monotone per
    offset (out keys ascending ⇔ in keys ascending at fixed offset);
    then dfeats = conv(g, rnbr, Wᵀ) with the SAME offset indexing.
    """
    from .sparse_conv_pallas import (sparse_conv_dw_gather_gemm,
                                     sparse_conv_gather_gemm_colwin)
    feats, nbr, weights, out_mask = res
    g = jnp.where(out_mask[..., None], g, 0.0).astype(jnp.float32)

    dW = sparse_conv_dw_gather_gemm(feats, nbr, g, out_mask)

    if self_map:
        w_rev = jnp.swapaxes(weights, 1, 2)[::-1]   # (K3, C_out, C_in)
        tile, chunk = _colwin_params(g.shape[-1])
        dfeats = sparse_conv_gather_gemm_colwin(
            g, nbr, w_rev, out_mask, tile=tile, chunk=chunk)
    else:
        B, V_out, K3 = nbr.shape
        V_in = feats.shape[1]
        hit = nbr >= 0
        safe = jnp.where(hit, nbr, V_in)            # OOB rows dropped
        v_ids = jnp.broadcast_to(
            jnp.arange(V_out, dtype=jnp.int32)[None, :, None],
            nbr.shape)
        b_ids = jnp.broadcast_to(
            jnp.arange(B, dtype=jnp.int32)[:, None, None], nbr.shape)
        k_ids = jnp.broadcast_to(
            jnp.arange(K3, dtype=jnp.int32)[None, None, :], nbr.shape)
        rnbr = jnp.full((B, V_in, K3), -1, jnp.int32)
        rnbr = rnbr.at[b_ids, safe, k_ids].set(v_ids, mode='drop')
        w_t = jnp.swapaxes(weights, 1, 2)           # (K3, C_out, C_in)
        in_mask = jnp.ones((B, V_in), bool)         # hitless rows -> 0
        tile, chunk = _colwin_params(g.shape[-1])
        dfeats = sparse_conv_gather_gemm_colwin(
            g, rnbr, w_t, in_mask, tile=tile, chunk=chunk)

    return (dfeats.astype(feats.dtype), None, dW.astype(weights.dtype),
            None)


_sparse_conv_pallas_ad.defvjp(_sparse_conv_pallas_fwd,
                              _sparse_conv_pallas_bwd)


def sparse_conv_apply(feats: jnp.ndarray, nbr: jnp.ndarray,
                      weights: jnp.ndarray,
                      out_mask: jnp.ndarray) -> jnp.ndarray:
    """Sparse convolution via gather + offset-wise matmul.

    Args:
        feats: (B, V_in, C_in) input features (0 at invalid slots).
        nbr: (B, V_out, K3) neighbor map (-1 = miss).
        weights: (K3, C_in, C_out).
        out_mask: (B, V_out).
    Returns:
        (B, V_out, C_out).
    """
    K3 = weights.shape[0]

    def step(acc, inp):
        w, idx = inp  # (C_in, C_out), (B, V_out)
        hit = idx >= 0
        safe = jnp.where(hit, idx, 0)
        g = jnp.take_along_axis(feats, safe[..., None], axis=1)
        g = jnp.where(hit[..., None], g, 0.0)
        return acc + jnp.einsum('bvc,cd->bvd', g, w,
                                preferred_element_type=jnp.float32), None

    acc0 = jnp.zeros(nbr.shape[:2] + (weights.shape[-1], ), jnp.float32)
    if os.environ.get('PT_UNROLL_SCANS'):
        # analytic-FLOPs mode (bench.py flops stages): XLA's HLO cost
        # analysis counts a while-loop body ONCE, not x trip count —
        # unrolling the offset scan makes the K3 conv matmuls visible
        out = acc0
        for k in range(K3):
            out, _ = step(out, (weights[k], nbr[..., k]))
    else:
        out, _ = jax.lax.scan(step, acc0,
                              (weights, jnp.moveaxis(nbr, -1, 0)))
    return jnp.where(out_mask[..., None], out, 0.0).astype(feats.dtype)


def sparse_max_pool(feats: jnp.ndarray, nbr: jnp.ndarray,
                    out_mask: jnp.ndarray) -> jnp.ndarray:
    """Max pooling over the neighbor map (misses ignored)."""
    hit = nbr >= 0
    safe = jnp.where(hit, nbr, 0)
    B, V_out, K3 = nbr.shape
    g = jnp.take_along_axis(feats[:, :, None, :],
                            safe.reshape(B, -1, 1, 1), axis=1)
    g = g.reshape(B, V_out, K3, feats.shape[-1])
    g = jnp.where(hit[..., None], g, -jnp.inf)
    out = jnp.max(g, axis=2)
    out = jnp.where(jnp.any(hit, axis=-1)[..., None], out, 0.0)
    return jnp.where(out_mask[..., None], out, 0.0)


def generative_transpose_map(fine: SparseLevel,
                             coarse: SparseLevel) -> Tuple[jnp.ndarray,
                                                           jnp.ndarray]:
    """Map for a kernel-2 stride-2 transpose conv evaluated at the fine
    level's coordinates.

    Every fine voxel has exactly one generating parent (floor(c/2)) and
    an offset id in [0, 8). Returns (parent_idx (B, V_f), offset_id).

    Note: ME's *generative* transpose also creates children absent from
    the fine map; here the up path is evaluated on the skip-connection
    coordinate set (those extra children carry no point evidence and
    are pruned by the score top-k anyway — documented deviation).
    """
    parent = fine.coords // 2
    off = fine.coords - parent * 2  # each in {0,1}
    off_id = (off[..., 0] * 2 + off[..., 1]) * 2 + off[..., 2]  # (B, V_f)
    pkeys = jnp.where(fine.mask, linearize(parent, coarse.extent), SENTINEL)
    parent_idx = lookup_center(coarse.keys, pkeys)
    return parent_idx, off_id.astype(jnp.int32)


def generative_transpose_apply(coarse_feats: jnp.ndarray,
                               parent_idx: jnp.ndarray,
                               offset_id: jnp.ndarray,
                               weights: jnp.ndarray,
                               out_mask: jnp.ndarray) -> jnp.ndarray:
    """Apply the transpose conv: out[v] = W[offset(v)] @ coarse[parent(v)].

    weights: (8, C_in, C_out).
    """
    hit = parent_idx >= 0
    safe = jnp.where(hit, parent_idx, 0)
    g = jnp.take_along_axis(coarse_feats, safe[..., None], axis=1)
    g = jnp.where(hit[..., None], g, 0.0)  # (B, V, C_in)
    # batched per-voxel weight selection: einsum with one-hot over the
    # 8 offsets compiles to 8 masked matmuls (MXU-friendly)
    onehot = jax.nn.one_hot(offset_id, 8, dtype=g.dtype)  # (B, V, 8)
    out = jnp.einsum('bvc,bvk,kcd->bvd', g, onehot, weights,
                     preferred_element_type=jnp.float32)
    return jnp.where(out_mask[..., None], out, 0.0).astype(coarse_feats.dtype)


@functools.partial(jax.jit, static_argnames=('capacity', ))
def compact_topk(level: SparseLevel, scores: jnp.ndarray, capacity: int,
                 extras: Tuple[jnp.ndarray, ...] = ()):
    """Physically prune to the `capacity` best-scoring valid voxels.

    The TPU analog of ME.MinkowskiPruning actually *shrinking* the
    tensor (reference mink_neck.py:163-186): where `prune_topk` only
    masks rows in place (leaving every downstream conv/norm/gather
    running at the full level capacity), this compacts the survivors
    into a new level of static capacity `capacity`, preserving
    ascending key order — so post-prune compute runs on ~P rows
    instead of ~50k.

    Selection matches `prune_topk` exactly: the top-`capacity` valid
    rows by score, ties broken by slot order (stable argsort).

    Args:
        level: the input level (keys sorted ascending).
        scores: (B, V) selection score.
        capacity: static output capacity.
        extras: optional (B, V) or (B, V, ...) arrays gathered
            alongside the level rows (0-filled at padding).
    Returns:
        (new_level, new_extras tuple, src): src is the (B, capacity)
        int32 source-row index per output slot (-1 at padding).
    """
    B, V = level.keys.shape
    s = jnp.where(level.mask, scores, -jnp.inf)
    order = jnp.argsort(-s, axis=1, stable=True)
    b_ids = jnp.arange(B, dtype=jnp.int32)[:, None]
    rank = jnp.zeros_like(order).at[b_ids, order].set(
        jnp.broadcast_to(jnp.arange(V), order.shape))
    keep = level.mask & (rank < capacity)
    # compaction slots in key order (rows are already key-sorted)
    pos = jnp.cumsum(keep.astype(jnp.int32), axis=1) - 1
    slot = jnp.where(keep, pos, capacity)
    src = jnp.full((B, capacity), -1, jnp.int32).at[b_ids, slot].set(
        jnp.broadcast_to(jnp.arange(V, dtype=jnp.int32), (B, V)),
        mode='drop')
    valid = src >= 0
    safe = jnp.where(valid, src, 0)

    def take(a, fill=0):
        idx = safe.reshape(B, capacity, *([1] * (a.ndim - 2)))
        g = jnp.take_along_axis(a, idx, axis=1)
        if a.ndim == 2:
            return jnp.where(valid, g, fill)
        return jnp.where(valid.reshape(valid.shape + (1, ) *
                                       (a.ndim - 2)), g, fill)

    new_level = SparseLevel(
        keys=take(level.keys, SENTINEL),
        coords=take(level.coords),
        feats=take(level.feats),
        mask=valid & take(level.mask, False),
        origin=level.origin,
        extent=level.extent,
        stride=level.stride,
        voxel_size=level.voxel_size)
    new_extras = tuple(take(e) for e in extras)
    return new_level, new_extras, src


def prune_topk(level: SparseLevel, scores: jnp.ndarray,
               k: int) -> SparseLevel:
    """Keep the top-k voxels per sample by score (ME pruning analog,
    reference mink_neck.py:163-186). Arrays stay in place; only the
    mask shrinks, so downstream shapes are unchanged."""
    s = jnp.where(level.mask, scores, -jnp.inf)
    # rank voxels by score (stable), keep the k best valid ones
    order = jnp.argsort(-s, axis=1, stable=True)
    rank = jnp.zeros_like(order).at[
        jnp.arange(order.shape[0])[:, None], order].set(
            jnp.broadcast_to(jnp.arange(order.shape[1]), order.shape))
    keep = level.mask & (rank < k)
    return level._replace(mask=keep,
                          feats=jnp.where(keep[..., None], level.feats, 0.0))
