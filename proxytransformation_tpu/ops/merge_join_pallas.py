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
#                       tile's window is only a few hundred keys.
#                       tile=128 (QR=1) default from a 2026-08 v5e scan
#                       on surface scenes: per-tile windows shrink with
#                       the tile, so compares drop ~1.5x vs tile=512
#                       (stem 23->14.7 ms, pool 8.3->5.4, s1 10.5->7.3)
NSLOTS = 4            # VMEM ring slots
AHEAD = 2             # producer runs this many chunks ahead

# SMEM pipeline state: producer (b, t, c), produced count, consumed
_PB, _PT, _PC, _PCNT, _CONS = range(5)


def _make_kernel(tile: int, chunk: int):
    CROWS = chunk // 128

    QR = tile // 128              # query block rows (lane-dense)

    def _join_kernel(start_ref,   # scalar prefetch (B, NT) int32
                     nch_ref,     # scalar prefetch (B, NT) int32
                     q_ref,       # (1, 1, QR, 128) int32 query block
                     keys_ref,    # (B, R, 128) int32 in ANY/HBM
                     om_ref,      # (1, 1, QR, 128) out: index of q-1
                     oc_ref,      # (1, 1, QR, 128) out: index of q
                     op_ref,      # (1, 1, QR, 128) out: index of q+1
                     buf,         # VMEM (NSLOTS, CROWS, 128) int32
                     st,          # SMEM (5,) pipeline state
                     sem):        # DMA sems (NSLOTS,)
        b = pl.program_id(0)
        t = pl.program_id(1)
        n_b, n_t = pl.num_programs(0), pl.num_programs(1)

        def produce_one(_=None):
            pb, pt, pc = st[_PB], st[_PT], st[_PC]

            @pl.when(pb < n_b)
            def _():
                ck = start_ref[pb, pt] + pc
                slot = jax.lax.rem(st[_PCNT], NSLOTS)
                pltpu.make_async_copy(
                    keys_ref.at[pb,
                                pl.ds(pl.multiple_of(ck * CROWS, CROWS),
                                      CROWS), :],
                    buf.at[slot], sem.at[slot]).start()
                st[_PCNT] = st[_PCNT] + 1
                nxt_pc = pc + 1
                done_t = nxt_pc >= nch_ref[pb, pt]
                st[_PC] = jnp.where(done_t, 0, nxt_pc)
                nxt_pt = jnp.where(done_t, pt + 1, pt)
                done_b = nxt_pt >= n_t
                st[_PT] = jnp.where(done_b, 0, nxt_pt)
                st[_PB] = jnp.where(done_b, pb + 1, pb)

        @pl.when((b == 0) & (t == 0))
        def _():
            for i in range(5):
                st[i] = 0
            for _ in range(AHEAD + 1):
                produce_one()

        # The all-pairs compare wants queries on SUBLANES so one
        # (1, 128) key row broadcasts across them. HBM arrays shaped
        # (..., TILE, 1) are lane-padded 128x (2.55 GB of pure padding
        # per operand at B=6 — the round-3 train OOM), so queries
        # travel lane-dense as (QR, 128) blocks, get tpu.transpose'd to
        # (128, QR) once per tile (Mosaic supports transpose but not a
        # lanes->column shape cast), and each of the QR query columns
        # runs the same all-pairs compare at identical vreg cost.
        qm1T = jnp.swapaxes(q_ref[0, 0], 0, 1) - 1   # (128, QR)
        start = start_ref[b, t]
        lane = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)

        def body(c, carry):
            maxes, mines = carry           # QR-tuples of (128, 128)
            slot = jax.lax.rem(st[_CONS], NSLOTS)
            ck = start + c
            pltpu.make_async_copy(
                keys_ref.at[b, pl.ds(pl.multiple_of(ck * CROWS, CROWS),
                                     CROWS), :],
                buf.at[slot], sem.at[slot]).wait()
            st[_CONS] = st[_CONS] + 1
            produce_one()

            rows = buf[slot]               # (CROWS, 128)
            base4 = (ck * chunk + lane) << 2
            new_maxes, new_mines = [], []
            for qr in range(QR):           # static unroll
                qcol = qm1T[:, qr:qr + 1]  # (128, 1) queries on sublanes
                me, mi = maxes[qr], mines[qr]
                for r in range(CROWS):     # static unroll
                    krow = rows[r][None, :]                   # (1, 128)
                    u = krow - qcol                           # (128, 128)
                    inb = ((u >= 0) & (u <= 2) & (krow != SENTINEL))
                    enc = (base4 + (r * 128 << 2)) + u
                    # elementwise accumulation — the cross-lane reduce
                    # happens ONCE per tile after the loop
                    me = jnp.maximum(me, jnp.where(inb, enc, -1))
                    mi = jnp.minimum(mi, jnp.where(inb, enc, SENTINEL))
                new_maxes.append(me)
                new_mines.append(mi)
            return tuple(new_maxes), tuple(new_mines)

        init = (tuple(jnp.full((128, 128), -1, jnp.int32)
                      for _ in range(QR)),
                tuple(jnp.full((128, 128), SENTINEL, jnp.int32)
                      for _ in range(QR)))
        maxes, mines = jax.lax.fori_loop(0, nch_ref[b, t], body, init)
        maxe = jnp.concatenate(
            [jnp.max(m, axis=1, keepdims=True) for m in maxes], axis=1)
        mine = jnp.concatenate(
            [jnp.min(m, axis=1, keepdims=True) for m in mines], axis=1)
        maxe = jnp.swapaxes(maxe, 0, 1)    # (QR, 128), lane-dense again
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
                      tile: int = 128, chunk: int = CHUNK,
                      interpret: bool = False):
    """For each query q find the key indices of q-1, q, q+1 (-1 = miss).

    Drop-in replacement for ops.sparse._batched_lookup_pmz.

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

    nt = -(-Q // tile)
    q_p = jnp.pad(queries.astype(jnp.int32),
                  ((0, 0), (0, nt * tile - Q)), constant_values=SENTINEL)
    qt = q_p.reshape(B, nt, tile)
    valid = qt != SENTINEL
    qmin = jnp.min(jnp.where(valid, qt, SENTINEL), axis=-1)
    qmax = jnp.max(jnp.where(valid, qt, INT_MIN), axis=-1)
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
    QR = tile // 128
    # queries and outputs travel lane-dense (B, nt, QR, 128) — only a
    # 2x sublane pad (QR=4 -> 8) instead of the 128x lane pad of a
    # (..., tile, 1) layout; the kernel relays to columns internally
    outs = pl.pallas_call(
        _make_kernel(tile, chunk),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, 1, QR, 128),
                             lambda b, t, s_r, n_r: (b, t, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.ANY),
            ],
            out_specs=[
                pl.BlockSpec((1, 1, QR, 128),
                             lambda b, t, s_r, n_r: (b, t, 0, 0),
                             memory_space=pltpu.VMEM)
                for _ in range(3)
            ],
            scratch_shapes=[
                pltpu.VMEM((NSLOTS, CROWS, 128), jnp.int32),
                pltpu.SMEM((5, ), jnp.int32),
                pltpu.SemaphoreType.DMA((NSLOTS, )),
            ],
        ),
        out_shape=[jax.ShapeDtypeStruct((B, nt, QR, 128), jnp.int32)
                   for _ in range(3)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('arbitrary', 'arbitrary'), ),
        cost_estimate=pl.CostEstimate(
            flops=7 * B * nt * tile * 2 * chunk,
            bytes_accessed=B * (V + 4 * Q) * 4,
            transcendentals=0),
        interpret=interpret,
    )(start, nch, qt.reshape(B, nt, QR, 128),
      keys_p.reshape(B, nchunk * CROWS, 128))

    return tuple(o.reshape(B, nt * tile)[:, :Q] for o in outs)


def lookup_stream(keys: jnp.ndarray, queries: jnp.ndarray,
                  tile: int = 128, interpret: bool = False) -> jnp.ndarray:
    """Exact-match lookup (drop-in for ops.sparse._batched_lookup)."""
    return lookup_pmz_stream(keys, queries, tile=tile,
                             interpret=interpret)[1]
