"""Pallas TPU merge-join: sorted-key lookup without sorts.

Replaces the XLA sort-join in `ops.sparse._batched_lookup_pmz` / ` _batched_lookup`
— the neighbor-map build was the biggest fixed cost of the sparse
engine (177 ms per B=2 forward at reference scale, measured r3), and
unlike the convolutions it does NOT shrink when most of the cloud is
masked out, because `lax.sort` cost is capacity-bound. Reference op:
the MinkowskiEngine coordinate-manager kernel maps (reference
embodiedscan/models/backbones/mink_resnet.py:58-124).

Structure. The voxel keys are sorted ascending per sample, so for any
query tile the matching keys live in one contiguous window whose chunk
bounds follow from per-chunk key maxima — both computable with cheap
XLA reduces, NO sort anywhere. Per (sample, tile) grid step:

    window = [first chunk that can hold qmin-1, first that exceeds qmax+1]
    stream the window's 1024-key chunks through a VMEM ring (the same
    scalar-prefetched producer/consumer pipeline as the sparse-conv
    kernel, ops/sparse_conv_pallas.py);
    per chunk row r (128 keys): u = k - (q-1) over the (TILE, 128)
    broadcast; encode hits u∈{0,1,2} as (key_index << 2 | u) and fold
    min/max accumulators across the window.

The (min, max) encodings decode ALL THREE answers per query — the
index of key q-1, q, and q+1 — because a query's matches are ≤3
consecutive key values with ascending indices:
    max gives the largest match (g_hi, u_hi), min the smallest;
    u_hi==1 or u_lo==1  → key q found directly;
    u_hi==2 ∧ u_lo==0   → q present iff g_hi - g_lo == 2 (its index is
                          then g_hi - 1: integer keys leave no other
                          value strictly between q-1 and q+1).

Compute is ~7 VPU ops per (query, key) visit and each key chunk is
DMA'd once per overlapping tile, so the join runs at compare-bandwidth
instead of O(n log² n) bitonic sort passes.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SENTINEL = np.int32(2**31 - 1)
INT_MIN = np.int32(-2**31 + 1)

CHUNK = 256           # default keys per window chunk (2 int32 sublane
#                       rows); small chunks keep tight windows cheap —
#                       the real map-build queries are sorted, so a
#                       128-query row's window is only a few hundred keys
NSLOTS = 4            # VMEM ring slots
AHEAD = 2             # producer runs this many chunks ahead

# SMEM pipeline state: producer (b, t, row, c), produced count, consumed
_PB, _PT, _PG, _PC, _PCNT, _CONS = range(6)


def _make_kernel(rows: int, chunk: int):
    """Kernel processing `rows` 128-query rows per grid step, each with
    its OWN key window.

    Two competing costs set the block size: per-grid-step overhead
    (dispatch, output-block setup, query transpose — ~1 µs/step, which
    DOMINATED the tile=128 round-4 kernel at 14k steps for the stem
    map) and window width (a SHARED window over a big tile spans the
    union of its rows' key ranges — the round-3 tile=512 kernel's
    compares grew ~1.5× per 4× tile). Per-row windows decouple them:
    the block is large (rows·128 queries amortize the fixed cost) while
    every row streams only its OWN few-hundred-key window, exactly as
    tile=128 did.
    """
    CROWS = chunk // 128

    def _join_kernel(start_ref,   # scalar prefetch (B, NT*ROWS) int32
                     nch_ref,     # scalar prefetch (B, NT*ROWS) int32
                     q_ref,       # (1, 1, ROWS, 128) int32 query block
                     keys_ref,    # (B, R, 128) int32 in ANY/HBM
                     om_ref,      # (1, 1, ROWS, 128) out: index of q-1
                     oc_ref,      # (1, 1, ROWS, 128) out: index of q
                     op_ref,      # (1, 1, ROWS, 128) out: index of q+1
                     buf,         # VMEM (NSLOTS, CROWS, 128) int32
                     st,          # SMEM (6,) pipeline state
                     sem):        # DMA sems (NSLOTS,)
        b = pl.program_id(0)
        t = pl.program_id(1)
        n_b, n_t = pl.num_programs(0), pl.num_programs(1)

        def produce_one(_=None):
            pb, pt, pg, pc = st[_PB], st[_PT], st[_PG], st[_PC]

            @pl.when(pb < n_b)
            def _():
                ck = start_ref[pb, pt * rows + pg] + pc
                slot = jax.lax.rem(st[_PCNT], NSLOTS)
                pltpu.make_async_copy(
                    keys_ref.at[pb,
                                pl.ds(pl.multiple_of(ck * CROWS, CROWS),
                                      CROWS), :],
                    buf.at[slot], sem.at[slot]).start()
                st[_PCNT] = st[_PCNT] + 1
                nxt_pc = pc + 1
                done_w = nxt_pc >= nch_ref[pb, pt * rows + pg]
                st[_PC] = jnp.where(done_w, 0, nxt_pc)
                nxt_pg = jnp.where(done_w, pg + 1, pg)
                done_g = nxt_pg >= rows
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

        # The all-pairs compare wants queries on SUBLANES so one
        # (1, 128) key row broadcasts across them. HBM arrays shaped
        # (..., TILE, 1) are lane-padded 128x (2.55 GB of pure padding
        # per operand at B=6 — the round-3 train OOM), so queries
        # travel lane-dense as (ROWS, 128) blocks, get tpu.transpose'd
        # to (128, ROWS) once per block (Mosaic supports transpose but
        # not a lanes->column shape cast), and each query column runs
        # the same all-pairs compare at identical vreg cost.
        qm1T = jnp.swapaxes(q_ref[0, 0], 0, 1) - 1   # (128, ROWS)
        lane = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)

        out_cols_max = []
        out_cols_min = []
        for g in range(rows):              # static unroll: row g's
            qcol = qm1T[:, g:g + 1]        # own window stream
            start = start_ref[b, t * rows + g]

            def body(c, carry, qcol=qcol, start=start):
                me, mi = carry             # (128, 128) accumulators
                slot = jax.lax.rem(st[_CONS], NSLOTS)
                ck = start + c
                pltpu.make_async_copy(
                    keys_ref.at[b,
                                pl.ds(pl.multiple_of(ck * CROWS, CROWS),
                                      CROWS), :],
                    buf.at[slot], sem.at[slot]).wait()
                st[_CONS] = st[_CONS] + 1
                produce_one()

                krows = buf[slot]          # (CROWS, 128)
                base4 = (ck * chunk + lane) << 2
                for r in range(CROWS):     # static unroll
                    krow = krows[r][None, :]                  # (1, 128)
                    u = krow - qcol                           # (128, 128)
                    inb = ((u >= 0) & (u <= 2) & (krow != SENTINEL))
                    enc = (base4 + (r * 128 << 2)) + u
                    # elementwise accumulation — the cross-lane reduce
                    # happens ONCE per row after the loop
                    me = jnp.maximum(me, jnp.where(inb, enc, -1))
                    mi = jnp.minimum(mi, jnp.where(inb, enc, SENTINEL))
                return me, mi

            me, mi = jax.lax.fori_loop(
                0, nch_ref[b, t * rows + g], body,
                (jnp.full((128, 128), -1, jnp.int32),
                 jnp.full((128, 128), SENTINEL, jnp.int32)))
            out_cols_max.append(jnp.max(me, axis=1, keepdims=True))
            out_cols_min.append(jnp.min(mi, axis=1, keepdims=True))

        maxe = jnp.concatenate(out_cols_max, axis=1)  # (128, ROWS)
        mine = jnp.concatenate(out_cols_min, axis=1)
        maxe = jnp.swapaxes(maxe, 0, 1)    # (ROWS, 128), lane-dense
        mine = jnp.swapaxes(mine, 0, 1)

        has = maxe >= 0
        uhi = maxe & 3
        ghi = jax.lax.shift_right_logical(maxe, 2)
        ulo = mine & 3
        glo = jax.lax.shift_right_logical(mine, 2)
        om_ref[0, 0] = jnp.where(has & (ulo == 0), glo, -1)
        op_ref[0, 0] = jnp.where(has & (uhi == 2), ghi, -1)
        oc_ref[0, 0] = jnp.where(
            has & (uhi == 1), ghi,
            jnp.where(has & (ulo == 1), glo,
                      jnp.where(has & (uhi == 2) & (ulo == 0)
                                & (ghi - glo == 2), ghi - 1, -1)))

    return _join_kernel


@functools.partial(jax.jit,
                   static_argnames=('tile', 'chunk', 'interpret'))
def lookup_pmz_stream(keys: jnp.ndarray, queries: jnp.ndarray,
                      tile: int = 1024, chunk: int = CHUNK,
                      interpret: bool = False):
    """For each query q find the key indices of q-1, q, q+1 (-1 = miss).

    Drop-in replacement for ops.sparse._batched_lookup_pmz.

    `tile` queries form one grid step's block; its tile//128 rows each
    stream their OWN key window (see _make_kernel — big blocks amortize
    the ~1 µs grid-step overhead, per-row windows keep compares at the
    tile=128 level). tile=1024 default from a 2026-08 v5e scan on
    surface-scene map builds.

    Args:
        keys: (B, V) int32 sorted ascending per sample, SENTINEL-padded,
            unique among valid entries.
        queries: (B, Q) int32, any order; SENTINEL = skip.
    Returns:
        (idx_minus, idx_center, idx_plus): (B, Q) int32 each.
    """
    B, V = keys.shape
    Q = queries.shape[1]

    CROWS = chunk // 128
    nchunk = -(-V // chunk)
    keys_p = jnp.pad(keys, ((0, 0), (0, nchunk * chunk - V)),
                     constant_values=SENTINEL)
    chunk_max = jnp.max(keys_p.reshape(B, nchunk, chunk), axis=-1)

    ROWS = tile // 128
    nt = -(-Q // tile)
    q_p = jnp.pad(queries.astype(jnp.int32),
                  ((0, 0), (0, nt * tile - Q)), constant_values=SENTINEL)
    # per-ROW window bounds: (B, nt*ROWS) rows of 128 queries each
    qr = q_p.reshape(B, nt * ROWS, 128)
    valid = qr != SENTINEL
    qmin = jnp.min(jnp.where(valid, qr, SENTINEL), axis=-1)
    qmax = jnp.max(jnp.where(valid, qr, INT_MIN), axis=-1)
    # window: chunks that can hold values in [qmin-1, qmax+1]
    # (saturating ±1 so pathological queries near the int32 limits
    # cannot wrap the window arithmetic)
    qlo = jnp.maximum(qmin, INT_MIN + 1) - 1
    qhi = jnp.minimum(qmax, SENTINEL - 1) + 1
    start = jnp.sum(chunk_max[:, None, :] < qlo[..., None],
                    axis=-1, dtype=jnp.int32)
    last = jnp.sum(chunk_max[:, None, :] < qhi[..., None],
                   axis=-1, dtype=jnp.int32)
    start = jnp.minimum(start, nchunk - 1)
    last = jnp.minimum(last, nchunk - 1)
    nch = jnp.maximum(last - start + 1, 1)

    grid = (B, nt)
    # queries and outputs travel lane-dense (B, nt, ROWS, 128) — only a
    # sublane pad instead of the 128x lane pad of a (..., tile, 1)
    # layout; the kernel relays to columns internally
    outs = pl.pallas_call(
        _make_kernel(ROWS, chunk),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, 1, ROWS, 128),
                             lambda b, t, s_r, n_r: (b, t, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.ANY),
            ],
            out_specs=[
                pl.BlockSpec((1, 1, ROWS, 128),
                             lambda b, t, s_r, n_r: (b, t, 0, 0),
                             memory_space=pltpu.VMEM)
                for _ in range(3)
            ],
            scratch_shapes=[
                pltpu.VMEM((NSLOTS, CROWS, 128), jnp.int32),
                pltpu.SMEM((6, ), jnp.int32),
                pltpu.SemaphoreType.DMA((NSLOTS, )),
            ],
        ),
        out_shape=[jax.ShapeDtypeStruct((B, nt, ROWS, 128), jnp.int32)
                   for _ in range(3)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('arbitrary', 'arbitrary'), ),
        cost_estimate=pl.CostEstimate(
            flops=7 * B * nt * tile * 2 * chunk,
            bytes_accessed=B * (V + 4 * Q) * 4,
            transcendentals=0),
        interpret=interpret,
    )(start, nch, q_p.reshape(B, nt, ROWS, 128),
      keys_p.reshape(B, nchunk * CROWS, 128))

    return tuple(o.reshape(B, nt * tile)[:, :Q] for o in outs)


def lookup_stream(keys: jnp.ndarray, queries: jnp.ndarray,
                  tile: int = 1024, interpret: bool = False) -> jnp.ndarray:
    """Exact-match lookup (drop-in for ops.sparse._batched_lookup)."""
    return lookup_pmz_stream(keys, queries, tile=tile,
                             interpret=interpret)[1]
