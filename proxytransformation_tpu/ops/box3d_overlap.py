"""Exact IoU of oriented 9-DoF 3D boxes, TPU-native.

Replaces pytorch3d's C++/CUDA `_C.iou_box3d` (reference:
embodiedscan/structures/bbox_3d/custom_box3d_overlap.py:94-166, consumed
by the eval metric at eval/metrics/grounding_metric.py:109 and the
matching cost at models/losses/match_cost.py:102-113).

TPU-first design — branch-free vertex enumeration instead of the
reference's sequential polyhedron clipping:
  * each box is 6 half-spaces (unit outward normals);
  * the intersection polytope is {x : A x <= b} with the stacked 12 rows;
  * every vertex of the polytope is the intersection of 3 of the 12
    planes → enumerate the 160 non-degenerate triples (triples holding
    two opposite faces of one box are singular) with Cramer's rule and
    keep the feasible ones (a fixed-size mask, no data-dependent shapes);
  * volume via the divergence theorem: V = (1/3) Σ_faces b_i · Area_i,
    where each face polygon is the feasible vertices on plane i sorted
    by angle (convexity makes angular sort correct).

Layout: STRUCTURE-OF-ARRAYS over a flat pair axis. Every tensor is
(P,) or (P, T=160) with the wide axis minor, so the VPU runs at full
lane width; plane/triple selection is static one-hot matmuls, and the
per-face angular sort carries its payloads through `lax.sort` (multi-
operand) instead of gathers. The first (vmapped, (…,3)-minor AoS)
formulation ran at 3/128 lane utilization and cost 592 ms for 4096
pairs on v5e; this one is ~40× faster at the same exactness. fp32
throughout (as the reference forces).
"""
from __future__ import annotations

from functools import partial
from itertools import combinations

import jax
import jax.numpy as jnp
import numpy as np

from ..structures.rotation import euler_angles_to_matrix

_OPPOSITE = {(0, 3), (1, 4), (2, 5), (6, 9), (7, 10), (8, 11)}
_TRIPLES = np.array([
    t for t in combinations(range(12), 3)
    if not ({(t[0], t[1]), (t[0], t[2]), (t[1], t[2])} & _OPPOSITE)
], dtype=np.int32)                                   # (160, 3)
_T = len(_TRIPLES)

# static one-hot selectors: pick triple-member planes via matmul
_SEL = [np.zeros((12, _T), np.float32) for _ in range(3)]
for _j in range(3):
    _SEL[_j][_TRIPLES[:, _j], np.arange(_T)] = 1.0


def box_planes(bbox: jnp.ndarray):
    """(..., 9) box → (..., 6, 3) unit outward normals, (..., 6) offsets."""
    center = bbox[..., :3]
    half = bbox[..., 3:6] / 2.0
    rot = euler_angles_to_matrix(bbox[..., 6:9], 'ZXY')  # columns = box axes
    axes = jnp.swapaxes(rot, -2, -1)  # (..., 3axes, 3)
    normals = jnp.concatenate([axes, -axes], axis=-2)  # (..., 6, 3)
    half2 = jnp.concatenate([half, half], axis=-1)  # (..., 6)
    offsets = jnp.sum(normals * center[..., None, :], axis=-1) + half2
    return normals, offsets


def _pairs_intersection_volume(boxes1: jnp.ndarray, boxes2: jnp.ndarray,
                               eps: float = 1e-4) -> jnp.ndarray:
    """Intersection volumes of aligned box pairs: (P, 9) × (P, 9) → (P,)."""
    boxes1 = boxes1.astype(jnp.float32)
    boxes2 = boxes2.astype(jnp.float32)
    n1, b1 = box_planes(boxes1)
    n2, b2 = box_planes(boxes2)
    A = jnp.concatenate([n1, n2], axis=1)           # (P, 12, 3)
    b = jnp.concatenate([b1, b2], axis=1)           # (P, 12)
    Ax, Ay, Az = A[..., 0], A[..., 1], A[..., 2]    # (P, 12) each

    scale = jnp.maximum(jnp.max(jnp.abs(b), axis=1, keepdims=True), 1.0)
    feps = eps * scale                              # (P, 1)

    sel = [jnp.asarray(s) for s in _SEL]

    def pick(comp, j):
        return jnp.matmul(comp, sel[j], precision='highest')  # (P, T)

    a0x, a0y, a0z = pick(Ax, 0), pick(Ay, 0), pick(Az, 0)
    a1x, a1y, a1z = pick(Ax, 1), pick(Ay, 1), pick(Az, 1)
    a2x, a2y, a2z = pick(Ax, 2), pick(Ay, 2), pick(Az, 2)
    bb0, bb1, bb2 = pick(b, 0), pick(b, 1), pick(b, 2)

    # Cramer: v = (b0·(a1×a2) + b1·(a2×a0) + b2·(a0×a1)) / det
    c12x = a1y * a2z - a1z * a2y
    c12y = a1z * a2x - a1x * a2z
    c12z = a1x * a2y - a1y * a2x
    c20x = a2y * a0z - a2z * a0y
    c20y = a2z * a0x - a2x * a0z
    c20z = a2x * a0y - a2y * a0x
    c01x = a0y * a1z - a0z * a1y
    c01y = a0z * a1x - a0x * a1z
    c01z = a0x * a1y - a0y * a1x
    det = a0x * c12x + a0y * c12y + a0z * c12z      # (P, T)
    ok_det = jnp.abs(det) > 1e-7
    inv = jnp.where(ok_det, 1.0 / jnp.where(ok_det, det, 1.0), 0.0)
    vx = (bb0 * c12x + bb1 * c20x + bb2 * c01x) * inv
    vy = (bb0 * c12y + bb1 * c20y + bb2 * c01y) * inv
    vz = (bb0 * c12z + bb1 * c20z + bb2 * c01z) * inv

    # feasibility against all 12 half-spaces: (P, 12, T) stack
    slack = (vx[:, None, :] * Ax[..., None] + vy[:, None, :] * Ay[..., None]
             + vz[:, None, :] * Az[..., None] - b[..., None])
    feasible = ok_det & jnp.all(slack <= feps[..., None], axis=1)
    on_plane = feasible[:, None, :] & (jnp.abs(slack) <= feps[..., None])
    vx = jnp.where(feasible, vx, 0.0)
    vy = jnp.where(feasible, vy, 0.0)
    vz = jnp.where(feasible, vz, 0.0)

    # per-plane orthonormal in-plane basis (SoA over (P, 12))
    use_x = jnp.abs(Ax) < 0.9
    altx = jnp.where(use_x, 1.0, 0.0)
    alty = jnp.where(use_x, 0.0, 1.0)
    ux = Ay * 0.0 - Az * alty          # cross(n, alt), altz = 0
    uy = Az * altx - Ax * 0.0
    uz = Ax * alty - Ay * altx
    un = jnp.sqrt(ux * ux + uy * uy + uz * uz)
    ux, uy, uz = ux / un, uy / un, uz / un
    wx = Ay * uz - Az * uy             # w = cross(n, u)
    wy = Az * ux - Ax * uz
    wz = Ax * uy - Ay * ux

    m = on_plane.astype(jnp.float32)                    # (P, 12, T)
    cnt = jnp.maximum(jnp.sum(m, axis=2), 1.0)          # (P, 12)
    cx = jnp.sum(m * vx[:, None, :], axis=2) / cnt
    cy = jnp.sum(m * vy[:, None, :], axis=2) / cnt
    cz = jnp.sum(m * vz[:, None, :], axis=2) / cnt
    rx = vx[:, None, :] - cx[..., None]                 # (P, 12, T)
    ry = vy[:, None, :] - cy[..., None]
    rz = vz[:, None, :] - cz[..., None]
    pu = rx * ux[..., None] + ry * uy[..., None] + rz * uz[..., None]
    pw = rx * wx[..., None] + ry * wy[..., None] + rz * wz[..., None]
    ang = jnp.where(on_plane, jnp.arctan2(pw, pu), 1e9)

    # angular sort per plane, payloads carried through the sort (no
    # gathers): flatten (P, 12) into the batch dim of one lax.sort
    P = ang.shape[0]
    flat = lambda x: x.reshape(P * 12, _T)
    _, pu_s, pw_s, msk_s = jax.lax.sort(
        (flat(ang), flat(pu), flat(pw),
         flat(on_plane.astype(jnp.int32))), dimension=1, num_keys=1)
    msk_s = msk_s.astype(bool)
    # fillers take the first (min-angle) vertex so the shoelace
    # wrap-around edge closes the polygon and fillers contribute 0
    pu_f = jnp.where(msk_s, pu_s, pu_s[:, :1])
    pw_f = jnp.where(msk_s, pw_s, pw_s[:, :1])
    cross = pu_f * jnp.roll(pw_f, -1, axis=1) - \
        pw_f * jnp.roll(pu_f, -1, axis=1)
    area = 0.5 * jnp.abs(jnp.sum(cross, axis=1)).reshape(P, 12)

    # de-duplicate coincident planes (identical boxes / shared faces):
    # static upper-triangle loop over the 66 plane pairs, (P,) math
    same = (Ax[:, :, None] * Ax[:, None, :]
            + Ay[:, :, None] * Ay[:, None, :]
            + Az[:, :, None] * Az[:, None, :]) > 1.0 - 1e-6
    same &= jnp.abs(b[:, :, None] - b[:, None, :]) <= feps[..., None]
    tri = jnp.asarray(np.tril(np.ones((12, 12), bool), -1))
    is_dup = jnp.any(same & tri, axis=2)                # (P, 12)

    vol = jnp.sum(jnp.where(is_dup, 0.0, b * area), axis=1) / 3.0
    return jnp.maximum(vol, 0.0)


def _pair_intersection_volume(box1: jnp.ndarray, box2: jnp.ndarray,
                              eps: float) -> jnp.ndarray:
    """Intersection volume of two (9,) boxes (legacy single-pair API)."""
    return _pairs_intersection_volume(box1[None], box2[None], eps)[0]


@partial(jax.jit, static_argnames=())
def box3d_intersection_volume(boxes1: jnp.ndarray, boxes2: jnp.ndarray,
                              eps: float = 1e-4) -> jnp.ndarray:
    """Pairwise intersection volumes: (N, 9) × (M, 9) → (N, M)."""
    N, M = boxes1.shape[0], boxes2.shape[0]
    b1 = jnp.broadcast_to(boxes1[:, None, :], (N, M, 9)).reshape(-1, 9)
    b2 = jnp.broadcast_to(boxes2[None, :, :], (N, M, 9)).reshape(-1, 9)
    return _pairs_intersection_volume(b1, b2, eps).reshape(N, M)


def box3d_iou(boxes1: jnp.ndarray, boxes2: jnp.ndarray,
              eps: float = 1e-4) -> jnp.ndarray:
    """Exact pairwise IoU of oriented boxes: (N, 9) × (M, 9) → (N, M)."""
    boxes1 = boxes1.astype(jnp.float32)
    boxes2 = boxes2.astype(jnp.float32)
    inter = box3d_intersection_volume(boxes1, boxes2, eps)
    v1 = jnp.prod(jnp.abs(boxes1[:, 3:6]), axis=-1)
    v2 = jnp.prod(jnp.abs(boxes2[:, 3:6]), axis=-1)
    union = v1[:, None] + v2[None, :] - inter
    return jnp.clip(inter / jnp.maximum(union, 1e-8), 0.0, 1.0)


def box3d_iou_aligned(boxes1: jnp.ndarray, boxes2: jnp.ndarray,
                      eps: float = 1e-4) -> jnp.ndarray:
    """Elementwise exact IoU: (..., 9) × (..., 9) → (...).

    One intersection-volume evaluation per aligned pair — use this when
    the pairing is already known (e.g. the per-sample (B, Q, G) cost in
    the Hungarian matcher) instead of the all-pairs `box3d_iou`, which
    would waste a B× factor on cross-sample pairs
    (reference IoU3DCost: models/losses/match_cost.py:102-113 computes
    per-sample (Q, G) blocks only).
    """
    shape = jnp.broadcast_shapes(boxes1.shape[:-1], boxes2.shape[:-1])
    flat1 = jnp.broadcast_to(boxes1, shape + (9, )).reshape(-1, 9)
    flat1 = flat1.astype(jnp.float32)
    flat2 = jnp.broadcast_to(boxes2, shape + (9, )).reshape(-1, 9)
    flat2 = flat2.astype(jnp.float32)
    inter = _pairs_intersection_volume(flat1, flat2, eps)
    v1 = jnp.prod(jnp.abs(flat1[:, 3:6]), axis=-1)
    v2 = jnp.prod(jnp.abs(flat2[:, 3:6]), axis=-1)
    union = v1 + v2 - inter
    iou = jnp.clip(inter / jnp.maximum(union, 1e-8), 0.0, 1.0)
    return iou.reshape(shape)
