"""Pallas TPU kernel for sparse convolution: monotone-window gather-GEMM.

Replaces the XLA `take_along_axis` gathers in `sparse_conv_apply` — the
whole-model bottleneck (measured 35-80 GB/s row-gather rate; the C=3
stem ran at 1.8 GB/s). Reference op: MinkowskiConvolution
(reference embodiedscan/models/backbones/mink_resnet.py:58-124).

Key structural fact (see ops/sparse.py): voxel keys are kept sorted
ascending per sample, and a kernel offset (dx,dy,dz) is a CONSTANT
additive shift in linearized key space. Hence for every kernel offset,
the per-output-voxel input indices are MONOTONE non-decreasing, and for
an output tile of T voxels the UNION of all offsets' hit input rows is
one contiguous window. Per (sample, tile) grid step:

    chunked contiguous DMA of feats[ulo : ulo + n·CH]   (HBM→VMEM)
    per chunk, per kernel offset k (statically unrolled):
        gather_k = one-hot_k(T, CH) @ chunk(CH, C_in)     [MXU]
        out_tile += gather_k @ W[k]                       [MXU]

No cross-vreg gather anywhere (Mosaic can't do it); the one-hot matmul
IS the gather. Misses (idx = -1) fall out of every one-hot compare, and
rows outside the current chunk fall out the same way, so arbitrary
window sizes are exact. One window feeds all K³ offsets, so DMA traffic
is ~C_in bytes/voxel (information-optimal) instead of 27·C_in.

DMA issue latency is hidden by a software pipeline: union window starts
and chunk counts are precomputed on the XLA side and scalar-prefetched
into SMEM, so a producer cursor runs AHEAD chunks in front of the
consumer over a VMEM ring — the DMA stream is fully determined from
SMEM state, independent of the data being fetched.

Precision: the gather matmuls run in bf16 — exact per element, because
every gathered element is a SINGLE picked bf16 value (one-hot rows are
disjoint across chunks and offsets' partial products are W-multiplied
separately), so the only rounding is the initial f32→bf16 cast of
features and weights. This matches the reference's AMP training
(reference tools/train.py:94-105) with bf16 instead of fp16; it also
matches XLA's default bf16 matmul precision used by the fallback path.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ALIGN = 16    # window starts 16-aligned (bf16 sublane tile)
NSLOTS = 4    # VMEM ring slots
AHEAD = 2     # producer runs this many chunks ahead of the consumer

# SMEM state layout: producer (b, t, og, c), produced count, consumed count
_PB, _PT, _PG, _PC, _PCNT, _CONS = range(6)


def _make_kernel(tile: int, kg: int, n_og: int, chunk: int):
    """Kernel processing `kg` kernel offsets per grid step."""
    CHUNK = chunk

    def _conv_kernel(ulo_ref,     # scalar prefetch: (B, n_tiles) int32
                     nch_ref,     # scalar prefetch: (B, n_tiles) int32
                     nbr_ref,     # (1, TILE, K3) int32 block (per tile)
                     feats_ref,   # (B, V_in_pad, C_in) bf16 in ANY/HBM
                     w_ref,       # (KG, C_in, C_out) bf16 block
                     out_ref,     # (1, TILE, C_out) f32 block, revisited
                     buf,         # VMEM (NSLOTS, CHUNK, C_in) bf16
                     st,          # SMEM (6,) pipeline state
                     sem):        # DMA sems (NSLOTS,)
        b = pl.program_id(0)
        t = pl.program_id(1)
        og = pl.program_id(2)
        n_b, n_t = pl.num_programs(0), pl.num_programs(1)

        @pl.when(og == 0)
        def _():
            out_ref[...] = jnp.zeros_like(out_ref)

        idx_all = nbr_ref[0]                      # (TILE, K3)
        lane = jax.lax.broadcasted_iota(jnp.int32, idx_all.shape, 1)

        def produce_one(_=None):
            """Issue the DMA at the producer cursor and advance it.

            The producer walks (b, t, og, c) — the same union window is
            re-produced for every og block, keeping producer/consumer in
            lockstep (og > 1 only for C_out=512 shapes, where V is small).
            """
            pb, pt, pc = st[_PB], st[_PT], st[_PC]

            @pl.when(pb < n_b)                    # not exhausted
            def _():
                base = ulo_ref[pb, pt] + pc * CHUNK
                slot = jax.lax.rem(st[_PCNT], NSLOTS)
                pltpu.make_async_copy(
                    feats_ref.at[pb, pl.ds(pl.multiple_of(base, ALIGN),
                                           CHUNK), :],
                    buf.at[slot], sem.at[slot]).start()
                st[_PCNT] = st[_PCNT] + 1
                nxt_pc = pc + 1
                done_w = nxt_pc >= nch_ref[pb, pt]
                st[_PC] = jnp.where(done_w, 0, nxt_pc)
                nxt_pg = jnp.where(done_w, st[_PG] + 1, st[_PG])
                done_g = nxt_pg >= n_og
                st[_PG] = jnp.where(done_g, 0, nxt_pg)
                nxt_pt = jnp.where(done_g, pt + 1, pt)
                done_t = nxt_pt >= n_t
                st[_PT] = jnp.where(done_t, 0, nxt_pt)
                st[_PB] = jnp.where(done_t, pb + 1, pb)

        @pl.when((b == 0) & (t == 0) & (og == 0))
        def _():
            for i in range(6):
                st[i] = 0
            for _ in range(AHEAD + 1):            # pipeline warm-up
                produce_one()

        ulo = ulo_ref[b, t]
        nch = nch_ref[b, t]

        def body(c, _):
            slot = jax.lax.rem(st[_CONS], NSLOTS)
            base = ulo + c * CHUNK
            pltpu.make_async_copy(
                feats_ref.at[b, pl.ds(pl.multiple_of(base, ALIGN),
                                      CHUNK), :],
                buf.at[slot], sem.at[slot]).wait()
            st[_CONS] = st[_CONS] + 1
            produce_one()                         # keep AHEAD in flight

            chunk_bf = buf[slot]                  # (CHUNK, C_in) bf16
            iota_ch = jax.lax.broadcasted_iota(jnp.int32, (tile, CHUNK), 1)
            for j in range(kg):                   # static unroll
                # offset's index column via a lane-masked reduce (no
                # dynamic lane slicing in Mosaic); NOTE: deliberately
                # inside the chunk loop — hoisting it across the
                # fori_loop spills registers and measures ~40% slower
                idx = jnp.max(
                    jnp.where(lane == og * kg + j, idx_all,
                              jnp.int32(-2**31 + 1)), axis=1)  # (TILE,)
                onehot = ((idx - base)[:, None] == iota_ch).astype(
                    jnp.bfloat16)
                g = jax.lax.dot(onehot, chunk_bf,
                                preferred_element_type=jnp.float32)
                # g holds exactly-picked bf16 values -> lossless cast
                out_ref[0] += jax.lax.dot(
                    g.astype(jnp.bfloat16), w_ref[j],
                    preferred_element_type=jnp.float32)
            return 0

        jax.lax.fori_loop(0, nch, body, 0)

    return _conv_kernel


def _pad_to(x, m, axis):
    pad = (-x.shape[axis]) % m
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _pick_kg(k3: int, c_in: int, c_out: int) -> int:
    """Largest divisor of K3 whose weight block fits ~4MB of VMEM."""
    budget = 4 * 1024 * 1024
    for kg in range(k3, 0, -1):
        if k3 % kg == 0 and kg * c_in * c_out * 2 <= budget:
            return kg
    return 1


@functools.partial(jax.jit,
                   static_argnames=('interpret', 'tile', 'chunk'))
def sparse_conv_gather_gemm(feats: jnp.ndarray, nbr: jnp.ndarray,
                            weights: jnp.ndarray, out_mask: jnp.ndarray,
                            interpret: bool = None,
                            tile: int = 0, chunk: int = 0) -> jnp.ndarray:
    """Drop-in replacement for ops.sparse.sparse_conv_apply.

    Args:
        feats: (B, V_in, C_in) float (0 at invalid slots).
        nbr: (B, V_out, K3) int32 neighbor map, -1 = miss; for each
            offset k, nbr[b, :, k] restricted to hits must be monotone
            non-decreasing over sorted-key voxel order (guaranteed by
            build_neighbor_map).
        weights: (K3, C_in, C_out).
        out_mask: (B, V_out) bool.
    Returns:
        (B, V_out, C_out), zeros at invalid output slots.
    """
    B, V_out, K3 = nbr.shape
    C_out = weights.shape[-1]
    in_dtype = feats.dtype
    if interpret is None:  # the bwd invokes this on whatever backend
        interpret = jax.default_backend() == 'cpu'

    # Tuned on v5e (2026-08, tile/chunk scan at stage shapes): small
    # tiles cut the one-hot gather-matmul FLOPs (∝ tile-window overlap)
    # while chunk=512 keeps most windows to a single DMA — (256, 512)
    # measured 4.3× over (512, 512) at V=25k C=64; tiles ≥ 1024 spill in
    # Mosaic and run ~2× slower despite better window amortization.
    tile = tile or 256
    CHUNK = chunk or 512

    # Mosaic DMA slices need a 128-aligned minor dim: pad C_in up.
    # (Zero channels contribute nothing; weights padded to match.)
    feats = _pad_to(feats.astype(jnp.bfloat16), 128, axis=2)
    weights = _pad_to(weights.astype(jnp.bfloat16), 128, axis=1)
    C_in = feats.shape[-1]
    kg = _pick_kg(K3, C_in, C_out)
    n_og = K3 // kg

    # pad output rows to a tile multiple; padded rows have idx=-1
    nbr_p = _pad_to(nbr, tile, axis=1)
    Vp = nbr_p.shape[1]
    n_tiles = Vp // tile

    # per-tile UNION windows over all offsets: ulo = min valid idx,
    # nch = chunks covering [ulo_aligned, max idx]; >= 1 so the DMA
    # stream stays deterministic even for all-miss tiles
    tiled = nbr_p.reshape(B, n_tiles, tile, K3)
    big = np.int32(2**31 - 1)
    ulo = jnp.min(jnp.where(tiled >= 0, tiled, big), axis=(2, 3))
    ulo = jnp.where(ulo == big, 0, ulo).astype(jnp.int32)
    ulo = ulo & ~jnp.int32(ALIGN - 1)
    uhi = jnp.max(tiled, axis=(2, 3))              # -1 if all miss
    nch = jnp.maximum(-(-(jnp.maximum(uhi - ulo + 1, 0)) // CHUNK),
                      1).astype(jnp.int32)

    # pad input rows so any chunk window is in bounds
    feats_p = _pad_to(feats, CHUNK, axis=1)
    feats_p = jnp.pad(feats_p, ((0, 0), (0, 2 * CHUNK), (0, 0)))

    grid = (B, n_tiles, n_og)
    out = pl.pallas_call(
        _make_kernel(tile, kg, n_og, CHUNK),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, tile, K3),
                             lambda b, t, og, lo_r, nch_r: (b, t, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec((kg, C_in, C_out),
                             lambda b, t, og, lo_r, nch_r: (og, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, tile, C_out),
                                   lambda b, t, og, lo_r, nch_r: (b, t, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((NSLOTS, CHUNK, C_in), jnp.bfloat16),
                pltpu.SMEM((6, ), jnp.int32),
                pltpu.SemaphoreType.DMA((NSLOTS, )),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((B, Vp, C_out), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('arbitrary', 'arbitrary', 'arbitrary'), ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * Vp * K3 * C_in * (C_out + CHUNK),
            bytes_accessed=B * Vp * C_in * 2,
            transcendentals=0),
        interpret=interpret,
    )(ulo, nch, nbr_p, feats_p, weights)

    out = out[:, :V_out]
    return jnp.where(out_mask[..., None], out, 0.0).astype(in_dtype)


# --------------------------------------------------------------------------
# dW kernel: the transposed problem, same monotone windows
# --------------------------------------------------------------------------
def _make_dw_kernel(tile: int, kg: int, n_og: int, chunk: int):
    """dW[k] = Σ_{b,v} feats[nbr[b,v,k]] ⊗ g[b,v], per offset group.

    Same gather machinery as the forward, with PER-GROUP windows
    (groups of kz consecutive offsets are (dx, dy) columns — the
    z-fold property makes their windows ~K3/kz× narrower than the
    all-offset union) and the matmul order flipped: per chunk and
    offset, the one-hot SCATTERS the g tile into chunk-row space (rows
    are disjoint because v ↦ nbr[v,k] is injective per offset — exact),
    then a single (C_in × CHUNK) @ (CHUNK × C_out) contraction
    accumulates into the resident (kg, C_in, C_out) f32 output block.
    The offset-group axis is the OUTERMOST grid dim so the output block
    stays in VMEM across all (b, tile) steps.
    """
    CHUNK = chunk

    def _dw_kernel(ulo_ref,     # scalar prefetch: (B*n_tiles*n_og,) —
                   nch_ref,     # flattened: SMEM pads the LAST dim to
                                # 128 lanes, so a 3-D (B, nt, 9) array
                                # would cost 14x its size (observed 1.2
                                # MB > the 1 MB SMEM budget at B=6)
                   act_ref,     # scalar prefetch: 1 if (tile, group)
                                # has any hit (occupancy skip)
                   nbr_ref,     # (1, TILE, K3) int32 block
                   g_ref,       # (1, TILE, C_out) bf16 block
                   feats_ref,   # (B, V_in_pad, C_in) bf16 in ANY/HBM
                   dw_ref,      # (KG, C_in, C_out) f32 block, revisited
                   buf,         # VMEM (NSLOTS, CHUNK, C_in) bf16
                   st,          # SMEM (6,) pipeline state
                   sem):        # DMA sems (NSLOTS,)
        og = pl.program_id(0)
        b = pl.program_id(1)
        t = pl.program_id(2)
        n_b, n_t = pl.num_programs(1), pl.num_programs(2)

        @pl.when((b == 0) & (t == 0))
        def _():
            dw_ref[...] = jnp.zeros_like(dw_ref)

        idx_all = nbr_ref[0]                      # (TILE, K3)
        lane = jax.lax.broadcasted_iota(jnp.int32, idx_all.shape, 1)

        def produce_one(_=None):
            # producer walks (og, b, t, c): each og pass re-streams the
            # same windows; st[_PG] tracks og so exhaustion is exact
            pg, pb, pt, pc = st[_PG], st[_PB], st[_PT], st[_PC]

            @pl.when(pg < n_og)
            def _():
                base = ulo_ref[(pb * n_t + pt) * n_og + pg] + pc * CHUNK
                slot = jax.lax.rem(st[_PCNT], NSLOTS)
                pltpu.make_async_copy(
                    feats_ref.at[pb, pl.ds(pl.multiple_of(base, ALIGN),
                                           CHUNK), :],
                    buf.at[slot], sem.at[slot]).start()
                st[_PCNT] = st[_PCNT] + 1
                nxt_pc = pc + 1
                done_w = nxt_pc >= nch_ref[(pb * n_t + pt) * n_og + pg]
                st[_PC] = jnp.where(done_w, 0, nxt_pc)
                nxt_pt = jnp.where(done_w, pt + 1, pt)
                done_t = nxt_pt >= n_t
                st[_PT] = jnp.where(done_t, 0, nxt_pt)
                nxt_pb = jnp.where(done_t, pb + 1, pb)
                done_b = nxt_pb >= n_b
                st[_PB] = jnp.where(done_b, 0, nxt_pb)
                st[_PG] = jnp.where(done_b, pg + 1, pg)

        @pl.when((og == 0) & (b == 0) & (t == 0))
        def _():
            for i in range(6):
                st[i] = 0
            for _ in range(AHEAD + 1):
                produce_one()

        ulo = ulo_ref[(b * n_t + t) * n_og + og]
        nch = nch_ref[(b * n_t + t) * n_og + og]
        act = act_ref[(b * n_t + t) * n_og + og]
        g_tile = g_ref[0]                         # (TILE, C_out) bf16

        def body(c, _):
            slot = jax.lax.rem(st[_CONS], NSLOTS)
            base = ulo + c * CHUNK
            pltpu.make_async_copy(
                feats_ref.at[b, pl.ds(pl.multiple_of(base, ALIGN),
                                      CHUNK), :],
                buf.at[slot], sem.at[slot]).wait()
            st[_CONS] = st[_CONS] + 1
            produce_one()

            # occupancy skip (see _make_colwin_kernel): all-miss
            # (tile, group) pairs contribute exactly zero to dW; the
            # DMA wait stays unconditional for semaphore lockstep
            @pl.when(act != 0)
            def _():
                chunk_bf = buf[slot]              # (CHUNK, C_in) bf16
                iota_ch = jax.lax.broadcasted_iota(
                    jnp.int32, (tile, CHUNK), 1)
                for j in range(kg):               # static unroll
                    idx = jnp.max(
                        jnp.where(lane == og * kg + j, idx_all,
                                  jnp.int32(-2**31 + 1)), axis=1)
                    onehot = ((idx - base)[:, None] == iota_ch).astype(
                        jnp.bfloat16)             # (TILE, CHUNK)
                    # scatter g rows into chunk-row space
                    # (disjoint -> exact)
                    sc = jax.lax.dot_general(
                        onehot, g_tile, (((0, ), (0, )), ((), ())),
                        preferred_element_type=jnp.float32)
                    dw_ref[j] += jax.lax.dot_general(
                        chunk_bf, sc.astype(jnp.bfloat16),
                        (((0, ), (0, )), ((), ())),
                        preferred_element_type=jnp.float32)
            return 0

        jax.lax.fori_loop(0, nch, body, 0)

    return _dw_kernel


@functools.partial(jax.jit,
                   static_argnames=('interpret', 'tile', 'chunk'))
def sparse_conv_dw_gather_gemm(feats: jnp.ndarray, nbr: jnp.ndarray,
                               g: jnp.ndarray, out_mask: jnp.ndarray,
                               interpret: bool = None,
                               tile: int = 0, chunk: int = 0
                               ) -> jnp.ndarray:
    """Weight gradient of the sparse conv, one Pallas pass.

    Replaces the XLA scan of 27 row-gathers + einsums in the conv
    backward (the train-step HBM hog). Args as the forward kernel, plus
    g: (B, V_out, C_out) output cotangent. Returns (K3, C_in, C_out)
    f32. Padded C_in rows are sliced off; misses and masked outputs
    contribute zero exactly as in the XLA formulation.
    """
    B, V_out, K3 = nbr.shape
    C_out = g.shape[-1]
    C_in_orig = feats.shape[-1]
    if interpret is None:
        interpret = jax.default_backend() == 'cpu'

    tile = tile or 256
    CHUNK = chunk or 512

    g = jnp.where(out_mask[..., None], g, 0.0)
    feats = _pad_to(feats.astype(jnp.bfloat16), 128, axis=2)
    C_in = feats.shape[-1]
    # prefer (dx, dy)-column groups: their windows are ~K3/kz× narrower
    # (z-fold); fall back to the VMEM-budget grouping otherwise
    kz = int(round(K3 ** (1. / 3)))
    if K3 > 1 and K3 % kz == 0 and kz * C_in * C_out * 4 <= 6 * 2**20:
        kg = kz
    else:
        kg = _pick_kg(K3, C_in, C_out)
    n_og = K3 // kg

    nbr_p = _pad_to(nbr, tile, axis=1)
    Vp = nbr_p.shape[1]
    n_tiles = Vp // tile
    g_p = _pad_to(g.astype(jnp.bfloat16), tile, axis=1)

    # per-(tile, offset-group) windows
    tiled = nbr_p.reshape(B, n_tiles, tile, n_og, kg)
    big = np.int32(2**31 - 1)
    ulo = jnp.min(jnp.where(tiled >= 0, tiled, big), axis=(2, 4))
    ulo = jnp.where(ulo == big, 0, ulo).astype(jnp.int32)
    ulo = ulo & ~jnp.int32(ALIGN - 1)              # (B, nt, n_og)
    uhi = jnp.max(tiled, axis=(2, 4))
    nch = jnp.maximum(-(-(jnp.maximum(uhi - ulo + 1, 0)) // CHUNK),
                      1).astype(jnp.int32)
    act = (uhi >= 0).astype(jnp.int32)

    feats_p = _pad_to(feats, CHUNK, axis=1)
    feats_p = jnp.pad(feats_p, ((0, 0), (0, 2 * CHUNK), (0, 0)))

    ulo = ulo.reshape(-1)
    nch = nch.reshape(-1)
    act = act.reshape(-1)
    grid = (n_og, B, n_tiles)
    dw = pl.pallas_call(
        _make_dw_kernel(tile, kg, n_og, CHUNK),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, tile, K3),
                             lambda og, b, t, lo_r, nch_r, act_r:
                             (b, t, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tile, C_out),
                             lambda og, b, t, lo_r, nch_r, act_r:
                             (b, t, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.ANY),
            ],
            out_specs=pl.BlockSpec((kg, C_in, C_out),
                                   lambda og, b, t, lo_r, nch_r, act_r:
                                   (og, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((NSLOTS, CHUNK, C_in), jnp.bfloat16),
                pltpu.SMEM((6, ), jnp.int32),
                pltpu.SemaphoreType.DMA((NSLOTS, )),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((K3, C_in, C_out), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('arbitrary', 'arbitrary', 'arbitrary'), ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * Vp * K3 * C_out * (C_in + CHUNK),
            bytes_accessed=n_og * B * Vp * C_in * 2,
            transcendentals=0),
        interpret=interpret,
    )(ulo, nch, act, nbr_p, g_p, feats_p)

    return dw[:, :C_in_orig]


# --------------------------------------------------------------------------
# column-window variant: per-(dx,dy) DMA windows
# --------------------------------------------------------------------------
def _make_colwin_kernel(tile: int, kz: int, chunk: int):
    """Forward conv with PER-COLUMN windows.

    kernel_offsets orders z fastest, so the kz offsets of one (dx, dy)
    column are consecutive map lanes AND consecutive key shifts — their
    shared window is ~K3/kz× narrower than the all-offset union (the
    z-fold property; measured 9.2× at stage-1 model shapes on scattered
    occupancy). Grid adds a column dim: each (b, tile, col) step streams
    only that column's window and runs kz one-hot gather-GEMMs, cutting
    the dominant one-hot FLOPs ∝ window size. Output block (b, t) stays
    resident across the col dim (innermost); weights arrive as (kz,
    C_in, C_out) blocks, ≤1.5 MB even at 512², so no offset-group
    splitting is ever needed.
    """
    CHUNK = chunk

    def _kernel(ulo_ref,     # scalar prefetch: (B*n_tiles*n_cols,) —
                nch_ref,     # flattened (see _dw_kernel: SMEM lane
                             # padding makes 3-D arrays 14x bigger)
                act_ref,     # scalar prefetch: 1 if (tile, col) has any
                             # hit — 0 tiles skip all compute (below)
                nbr_ref,     # (1, TILE, K3) int32 block (per tile)
                feats_ref,   # (B, V_in_pad, C_in) bf16 in ANY/HBM
                w_ref,       # (kz, C_in, C_out) bf16 block (per col)
                out_ref,     # (1, TILE, C_out) f32 block, revisited
                buf,         # VMEM (NSLOTS, CHUNK, C_in) bf16
                st,          # SMEM (6,) pipeline state
                sem):        # DMA sems (NSLOTS,)
        b = pl.program_id(0)
        t = pl.program_id(1)
        col = pl.program_id(2)
        n_b, n_t, n_c = (pl.num_programs(0), pl.num_programs(1),
                         pl.num_programs(2))

        @pl.when(col == 0)
        def _():
            out_ref[...] = jnp.zeros_like(out_ref)

        idx_all = nbr_ref[0]                      # (TILE, K3)
        lane = jax.lax.broadcasted_iota(jnp.int32, idx_all.shape, 1)

        def produce_one(_=None):
            pb, pt, pg, pc = st[_PB], st[_PT], st[_PG], st[_PC]

            @pl.when(pb < n_b)
            def _():
                base = ulo_ref[(pb * n_t + pt) * n_c + pg] + pc * CHUNK
                slot = jax.lax.rem(st[_PCNT], NSLOTS)
                pltpu.make_async_copy(
                    feats_ref.at[pb, pl.ds(pl.multiple_of(base, ALIGN),
                                           CHUNK), :],
                    buf.at[slot], sem.at[slot]).start()
                st[_PCNT] = st[_PCNT] + 1
                nxt_pc = pc + 1
                done_w = nxt_pc >= nch_ref[(pb * n_t + pt) * n_c + pg]
                st[_PC] = jnp.where(done_w, 0, nxt_pc)
                nxt_pg = jnp.where(done_w, pg + 1, pg)
                done_g = nxt_pg >= n_c
                st[_PG] = jnp.where(done_g, 0, nxt_pg)
                nxt_pt = jnp.where(done_g, pt + 1, pt)
                done_t = nxt_pt >= n_t
                st[_PT] = jnp.where(done_t, 0, nxt_pt)
                st[_PB] = jnp.where(done_t, pb + 1, pb)

        @pl.when((b == 0) & (t == 0) & (col == 0))
        def _():
            for i in range(6):
                st[i] = 0
            for _ in range(AHEAD + 1):
                produce_one()

        ulo = ulo_ref[(b * n_t + t) * n_c + col]
        nch = nch_ref[(b * n_t + t) * n_c + col]
        act = act_ref[(b * n_t + t) * n_c + col]

        def body(c, _):
            slot = jax.lax.rem(st[_CONS], NSLOTS)
            base = ulo + c * CHUNK
            pltpu.make_async_copy(
                feats_ref.at[b, pl.ds(pl.multiple_of(base, ALIGN),
                                      CHUNK), :],
                buf.at[slot], sem.at[slot]).wait()
            st[_CONS] = st[_CONS] + 1
            produce_one()

            # occupancy skip: all-miss (tile, col) pairs — the invalid
            # capacity tail (keys sort SENTINEL rows last, so an
            # underfilled level ends in all-miss tiles: real surface
            # scans fill only ~33-63% of the coarse-level capacities)
            # plus out-of-extent boundary columns — contribute exactly
            # zero, so skip their gather+GEMMs. The flag comes
            # precomputed from SMEM (an in-kernel idx reduce per offset
            # measured ~20% SLOWER than no skip: it serializes the dot
            # pipeline). The DMA wait above stays unconditional to keep
            # producer/consumer semaphores in lockstep; a skipped tile
            # costs one streamed chunk and nothing else.
            @pl.when(act != 0)
            def _():
                chunk_bf = buf[slot]              # (CHUNK, C_in) bf16
                iota_ch = jax.lax.broadcasted_iota(
                    jnp.int32, (tile, CHUNK), 1)
                # stack the kz one-hots along sublanes and gather with
                # ONE (kz·tile, CHUNK) dot: same FLOPs, 1/kz the MXU
                # ops — the serialized per-chunk onehot→dot chain is
                # the kernel's floor, so fewer/larger ops win
                ohs = []
                for j in range(kz):               # static unroll
                    idx = jnp.max(
                        jnp.where(lane == col * kz + j, idx_all,
                                  jnp.int32(-2**31 + 1)), axis=1)
                    ohs.append(((idx - base)[:, None] == iota_ch).astype(
                        jnp.bfloat16))
                g = jax.lax.dot(jnp.concatenate(ohs, axis=0), chunk_bf,
                                preferred_element_type=jnp.float32)
                for j in range(kz):
                    out_ref[0] += jax.lax.dot(
                        g[j * tile:(j + 1) * tile].astype(jnp.bfloat16),
                        w_ref[0, j],
                        preferred_element_type=jnp.float32)
            return 0

        jax.lax.fori_loop(0, nch, body, 0)

    return _kernel


def _make_colfold_kernel(tile: int, kz: int, n_cols: int, chunk: int):
    """Column-window conv with ALL columns folded into one grid step.

    The per-column grid of `_make_colwin_kernel` pays ~1 µs of Mosaic
    step overhead per (b, tile, col) — at stage-1 model shapes that is
    B·196·9 ≈ 3.5k steps ≈ 3.5 ms, MORE than the kernel's matmul time
    (the same overhead the merge-join kernel eliminated with big
    blocks). Here the grid is (b, tile) and the 9 (dx, dy) columns run
    inside the body, each still streaming its own tight window through
    the same producer/consumer DMA pipeline (the producer cursor
    already traversed (b, t, col, chunk) — only its `n_cols` source
    changes from a grid dim to a static). Requires the FULL weight
    block (K3, C_in, C_out) resident in VMEM, so the caller only
    routes here when C_in·C_out·K3·2B is small (≤128-channel stages —
    exactly the overhead-dominated ones).
    """
    CHUNK = chunk

    def _kernel(ulo_ref,     # (B*n_tiles*n_cols,) scalar prefetch
                nch_ref,
                act_ref,
                nbr_ref,     # (1, TILE, K3) int32 block
                feats_ref,   # (B, V_in_pad, C_in) bf16 in ANY/HBM
                w_ref,       # (n_cols, kz, C_in, C_out) bf16 — FULL
                out_ref,     # (1, TILE, C_out) f32 block
                buf,         # VMEM (NSLOTS, CHUNK, C_in) bf16
                st,          # SMEM (6,) pipeline state
                sem):        # DMA sems (NSLOTS,)
        b = pl.program_id(0)
        t = pl.program_id(1)
        n_b, n_t = pl.num_programs(0), pl.num_programs(1)

        out_ref[...] = jnp.zeros_like(out_ref)

        idx_all = nbr_ref[0]                      # (TILE, K3)
        lane = jax.lax.broadcasted_iota(jnp.int32, idx_all.shape, 1)
        iota_ch = jax.lax.broadcasted_iota(jnp.int32, (tile, CHUNK), 1)

        def produce_one(_=None):
            pb, pt, pg, pc = st[_PB], st[_PT], st[_PG], st[_PC]

            @pl.when(pb < n_b)
            def _():
                base = ulo_ref[(pb * n_t + pt) * n_cols + pg] + pc * CHUNK
                slot = jax.lax.rem(st[_PCNT], NSLOTS)
                pltpu.make_async_copy(
                    feats_ref.at[pb, pl.ds(pl.multiple_of(base, ALIGN),
                                           CHUNK), :],
                    buf.at[slot], sem.at[slot]).start()
                st[_PCNT] = st[_PCNT] + 1
                nxt_pc = pc + 1
                done_w = nxt_pc >= nch_ref[(pb * n_t + pt) * n_cols + pg]
                st[_PC] = jnp.where(done_w, 0, nxt_pc)
                nxt_pg = jnp.where(done_w, pg + 1, pg)
                done_g = nxt_pg >= n_cols
                st[_PG] = jnp.where(done_g, 0, nxt_pg)
                nxt_pt = jnp.where(done_g, pt + 1, pt)
                done_t = nxt_pt >= n_t
                st[_PT] = jnp.where(done_t, 0, nxt_pt)
                st[_PB] = jnp.where(done_t, pb + 1, pb)

        @pl.when((b == 0) & (t == 0))
        def _():
            for i in range(6):
                st[i] = 0
            for _ in range(AHEAD + 1):
                produce_one()

        def col_body(g, _):
            ulo = ulo_ref[(b * n_t + t) * n_cols + g]
            nch = nch_ref[(b * n_t + t) * n_cols + g]
            act = act_ref[(b * n_t + t) * n_cols + g]

            def body(c, _):
                slot = jax.lax.rem(st[_CONS], NSLOTS)
                base = ulo + c * CHUNK
                pltpu.make_async_copy(
                    feats_ref.at[b, pl.ds(pl.multiple_of(base, ALIGN),
                                          CHUNK), :],
                    buf.at[slot], sem.at[slot]).wait()
                st[_CONS] = st[_CONS] + 1
                produce_one()

                # occupancy skip (see _make_colwin_kernel): all-miss
                # (tile, col) pairs contribute exactly zero; DMA waits
                # stay unconditional to keep the semaphores in lockstep
                @pl.when(act != 0)
                def _():
                    chunk_bf = buf[slot]          # (CHUNK, C_in) bf16
                    for j in range(kz):           # static unroll
                        idx = jnp.max(
                            jnp.where(lane == g * kz + j, idx_all,
                                      jnp.int32(-2**31 + 1)), axis=1)
                        onehot = ((idx - base)[:, None]
                                  == iota_ch).astype(jnp.bfloat16)
                        gth = jax.lax.dot(
                            onehot, chunk_bf,
                            preferred_element_type=jnp.float32)
                        out_ref[0] += jax.lax.dot(
                            gth.astype(jnp.bfloat16), w_ref[g, j],
                            preferred_element_type=jnp.float32)
                return 0

            jax.lax.fori_loop(0, nch, body, 0)
            return 0

        jax.lax.fori_loop(0, n_cols, col_body, 0)

    return _kernel


# full-weight-block VMEM budget for the folded kernel (bf16 bytes);
# 27·128·128·2 = 884 KB passes, 27·256·256·2 = 3.5 MB stays on the
# per-column grid
_COLFOLD_WEIGHT_BYTES = 1 << 20


@functools.partial(jax.jit,
                   static_argnames=('interpret', 'tile', 'chunk', 'kz',
                                    'fold', 'all_active'))
def sparse_conv_gather_gemm_colwin(feats: jnp.ndarray, nbr: jnp.ndarray,
                                   weights: jnp.ndarray,
                                   out_mask: jnp.ndarray,
                                   interpret: bool = None,
                                   tile: int = 0, chunk: int = 0,
                                   kz: int = 0,
                                   fold: bool = None,
                                   all_active: bool = False) -> jnp.ndarray:
    """Column-window sparse conv (see _make_colwin_kernel).

    kz is the kernel z-extent (offsets per column); defaults to
    round(K3^(1/3)) — 3 for k3 maps, 2 for k2 pool maps. Falls back on
    the union-window kernel when K3 has no column structure.

    fold: None = auto (fold the column grid dim into the body when the
    full weight block fits VMEM, see _make_colfold_kernel); True/False
    force the choice (tuning).

    all_active: force every (tile, column) occupancy flag on, disabling
    the all-miss skip branch — the A/B control for proving the skip is
    bit-exact (tools/verify_tpu_exactness.py) and for tuning.
    """
    B, V_out, K3 = nbr.shape
    C_out = weights.shape[-1]
    in_dtype = feats.dtype
    if interpret is None:
        interpret = jax.default_backend() == 'cpu'

    kz = kz or int(round(K3 ** (1. / 3)))
    if K3 == 1 or K3 % kz != 0:
        return sparse_conv_gather_gemm(feats, nbr, weights, out_mask,
                                       interpret=interpret, tile=tile,
                                       chunk=chunk)
    n_cols = K3 // kz

    tile = tile or 256
    CHUNK = chunk or 512

    feats = _pad_to(feats.astype(jnp.bfloat16), 128, axis=2)
    weights = _pad_to(weights.astype(jnp.bfloat16), 128, axis=1)
    C_in = feats.shape[-1]

    nbr_p = _pad_to(nbr, tile, axis=1)
    Vp = nbr_p.shape[1]
    n_tiles = Vp // tile

    # per-(tile, column) windows
    tiled = nbr_p.reshape(B, n_tiles, tile, n_cols, kz)
    big = np.int32(2**31 - 1)
    ulo = jnp.min(jnp.where(tiled >= 0, tiled, big), axis=(2, 4))
    ulo = jnp.where(ulo == big, 0, ulo).astype(jnp.int32)
    ulo = ulo & ~jnp.int32(ALIGN - 1)                  # (B, nt, n_cols)
    uhi = jnp.max(tiled, axis=(2, 4))
    nch = jnp.maximum(-(-(jnp.maximum(uhi - ulo + 1, 0)) // CHUNK),
                      1).astype(jnp.int32)
    act = (uhi >= 0).astype(jnp.int32)    # any hit in this (tile, col)
    if all_active:
        act = jnp.ones_like(act)

    feats_p = _pad_to(feats, CHUNK, axis=1)
    feats_p = jnp.pad(feats_p, ((0, 0), (0, 2 * CHUNK), (0, 0)))

    w_cols = weights.reshape(n_cols, kz, C_in, C_out)

    ulo = ulo.reshape(-1)
    nch = nch.reshape(-1)
    act = act.reshape(-1)

    if fold is None:
        # default OFF: at stage-1/stem shapes the folded kernel measured
        # ~parity with the per-column grid (the ~1 µs/step Mosaic
        # overhead hypothesis did not hold — the cost is the serialized
        # one-hot/dot chain, which folding does not change); kept as an
        # opt-in for tuning via tools/tune_conv.py --fold
        fold = False
    fold = fold and K3 * C_in * C_out * 2 <= _COLFOLD_WEIGHT_BYTES
    if fold:
        # fold the columns into the body: grid (B, n_tiles) — the
        # per-step Mosaic overhead (~1 µs) otherwise exceeds the matmul
        # time at the ≤128-channel stages
        out = pl.pallas_call(
            _make_colfold_kernel(tile, kz, n_cols, CHUNK),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=3,
                grid=(B, n_tiles),
                in_specs=[
                    pl.BlockSpec((1, tile, K3),
                                 lambda b, t, lo_r, nch_r, act_r:
                                 (b, t, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.ANY),
                    pl.BlockSpec((n_cols, kz, C_in, C_out),
                                 lambda b, t, lo_r, nch_r, act_r:
                                 (0, 0, 0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((1, tile, C_out),
                                       lambda b, t, lo_r, nch_r, act_r:
                                       (b, t, 0),
                                       memory_space=pltpu.VMEM),
                scratch_shapes=[
                    pltpu.VMEM((NSLOTS, CHUNK, C_in), jnp.bfloat16),
                    pltpu.SMEM((6, ), jnp.int32),
                    pltpu.SemaphoreType.DMA((NSLOTS, )),
                ],
            ),
            out_shape=jax.ShapeDtypeStruct((B, Vp, C_out), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=('arbitrary', 'arbitrary'), ),
            cost_estimate=pl.CostEstimate(
                flops=2 * B * Vp * K3 * C_in * (C_out + CHUNK),
                bytes_accessed=B * Vp * C_in * 2,
                transcendentals=0),
            interpret=interpret,
        )(ulo, nch, act, nbr_p, feats_p, w_cols)
    else:
        grid = (B, n_tiles, n_cols)
        out = pl.pallas_call(
            _make_colwin_kernel(tile, kz, CHUNK),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=3,
                grid=grid,
                in_specs=[
                    pl.BlockSpec((1, tile, K3),
                                 lambda b, t, c, lo_r, nch_r, act_r:
                                 (b, t, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.ANY),
                    pl.BlockSpec((1, kz, C_in, C_out),
                                 lambda b, t, c, lo_r, nch_r, act_r:
                                 (c, 0, 0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((1, tile, C_out),
                                       lambda b, t, c, lo_r, nch_r, act_r:
                                       (b, t, 0),
                                       memory_space=pltpu.VMEM),
                scratch_shapes=[
                    pltpu.VMEM((NSLOTS, CHUNK, C_in), jnp.bfloat16),
                    pltpu.SMEM((6, ), jnp.int32),
                    pltpu.SemaphoreType.DMA((NSLOTS, )),
                ],
            ),
            out_shape=jax.ShapeDtypeStruct((B, Vp, C_out), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=('arbitrary', 'arbitrary',
                                     'arbitrary'), ),
            cost_estimate=pl.CostEstimate(
                flops=2 * B * Vp * K3 * C_in * (C_out + CHUNK),
                bytes_accessed=B * Vp * C_in * 2,
                transcendentals=0),
            interpret=interpret,
        )(ulo, nch, act, nbr_p, feats_p, w_cols)

    out = out[:, :V_out]
    return jnp.where(out_mask[..., None], out, 0.0).astype(in_dtype)
