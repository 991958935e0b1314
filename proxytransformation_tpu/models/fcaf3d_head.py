"""FCAF3D anchor-free detection head (FPN + head), TPU-native.

Re-design of the reference `FCAF3DHead` / `FCAF3DHeadRotMat`
(reference: models/dense_heads/fcaf3d_head.py:29-1750): the sparse FPN
with score pruning (shared machinery with MinkNeck) plus per-level
centerness / classification / box-regression convolutions with a
per-level learnable scale, FCAF-style face-distance box coding, and the
FCAF3D target assignment (inside-box → best-level by positive count →
top-k by centerness → min-volume).

Static shapes: levels are compacted to `pts_prune_threshold` rows each,
ordered fine→coarse like the reference's reversed outputs (:200-206);
target assignment is fully vectorized over (P_total, G) with masks.
Multi-class NMS prediction is host-side (`multiclass_nms_host`),
mirroring nms3d/nms3d_normal usage (:791-796).
"""
from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops.sparse import (SENTINEL, SparseLevel, build_neighbor_map,
                          compact_topk, generative_transpose_map, linearize,
                          lookup_center)
from ..structures.rotation import (rotation_3d_in_euler, ortho_6d_to_matrix,
                                   matrix_to_euler_angles)
from ..utils.registry import MODELS
from .det_losses import (binary_cross_entropy_with_logits,
                         rotated_iou_3d_loss)
from .losses import sigmoid_focal_loss
from .sparse_neck import _OutBlock, _UpBlock, _compact_by_score

_PRIOR_BIAS = float(-np.log((1 - 0.01) / 0.01))


def get_face_distances(points: jnp.ndarray, boxes: jnp.ndarray) -> jnp.ndarray:
    """Distances from points to the 6 faces of 9-DoF boxes.

    Args:
        points: (P, G, 3); boxes: (P, G, 9) (broadcast pairs).
    Returns:
        (P, G, 6): (dx_min, dx_max, dy_min, dy_max, dz_min, dz_max).
    Reference :627-661 (including its use of euler −angles).
    """
    shift = points - boxes[..., :3]  # (P, G, 3)
    # reference rotates by -euler (its convention); shapes (G, P, 3)
    shift = rotation_3d_in_euler(
        jnp.swapaxes(shift, 0, 1), -boxes[0, :, 6:9])
    shift = jnp.swapaxes(shift, 0, 1)
    centers = boxes[..., :3] + shift
    half = boxes[..., 3:6] / 2
    dmin = centers - (boxes[..., :3] - half)
    dmax = (boxes[..., :3] + half) - centers
    return jnp.stack([dmin[..., 0], dmax[..., 0], dmin[..., 1],
                      dmax[..., 1], dmin[..., 2], dmax[..., 2]], -1)


def get_centerness(face_distances: jnp.ndarray) -> jnp.ndarray:
    """sqrt(prod min/max per axis) (reference :663-680)."""
    x = face_distances[..., 0:2]
    y = face_distances[..., 2:4]
    z = face_distances[..., 4:6]
    c = (jnp.min(x, -1) / jnp.maximum(jnp.max(x, -1), 1e-8)
         * jnp.min(y, -1) / jnp.maximum(jnp.max(y, -1), 1e-8)
         * jnp.min(z, -1) / jnp.maximum(jnp.max(z, -1), 1e-8))
    return jnp.sqrt(jnp.clip(c, 0.0, None))


@MODELS.register_module()
class FCAF3DHead(nn.Module):
    num_classes: int = 284
    in_channels: Sequence[int] = (128, 256, 512, 1024)
    out_channels: int = 128
    num_reg_outs: int = 9  # 6 face distances + 3 euler
    voxel_size: float = 0.01
    pts_prune_threshold: int = 1000
    pts_assign_threshold: int = 27
    pts_center_threshold: int = 18
    rot_param: str = 'euler'  # 'ortho6d' = FCAF3DHeadRotMat (num_reg 12)
    center_loss_weight: float = 1.0
    bbox_loss_weight: float = 1.0
    cls_loss_weight: float = 1.0

    @property
    def n_levels(self):
        return len(self.in_channels)

    # ------------------------------------------------------------------
    @nn.compact
    def __call__(self, inputs: List[SparseLevel], train: bool = False,
                 self_maps=None):
        """FPN + head convs. Returns, each fine→coarse-concatenated with
        static P rows/level: center (B,LP,1), bbox (B,LP,R), cls (B,LP,C),
        points (B,LP,3), mask (B,LP), level_ids (LP,)."""
        n = self.n_levels
        conv_center = nn.Dense(1, name='conv_center')
        conv_cls = nn.Dense(self.num_classes,
                            kernel_init=nn.initializers.normal(0.01),
                            bias_init=nn.initializers.constant(_PRIOR_BIAS),
                            name='conv_cls')
        conv_reg = nn.Dense(self.num_reg_outs, name='conv_reg')

        outs = {}
        P = self.pts_prune_threshold
        cur = None  # compacted coarser level, feats = x
        prune_score = None
        for i in range(n - 1, -1, -1):
            fine = inputs[i]
            if i < n - 1:
                # physical prune-compact by parent score, then up + sum,
                # then final prune to P — same two-stage machinery as
                # MinkNeck (see sparse_neck.py docstring)
                pkeys = jnp.where(
                    fine.mask, linearize(fine.coords // 2, cur.extent),
                    SENTINEL)
                parent_idx = lookup_center(cur.keys, pkeys)
                hit = parent_idx >= 0
                ps = jnp.take_along_axis(prune_score,
                                         jnp.where(hit, parent_idx, 0),
                                         axis=1)
                ps = jnp.where(hit, ps, 0.0)
                lvl, (ps_c, ), _ = compact_topk(
                    fine, ps, min(4 * P, fine.capacity), extras=(ps, ))
                parent_idx_c, offset_id = generative_transpose_map(lvl, cur)
                nbr_up = build_neighbor_map(lvl, lvl, 3, 1)
                up = _UpBlock(self.in_channels[i],
                              name=f'up_block_{i + 1}')(
                                  cur.feats, parent_idx_c, offset_id,
                                  nbr_up, lvl.mask, train)
                x = lvl.feats + up
                lvl, _, _ = compact_topk(lvl._replace(feats=x), ps_c,
                                         min(P, lvl.capacity))
                x = lvl.feats
                fine_nbr = build_neighbor_map(lvl, lvl, 3, 1)
            else:
                lvl = fine
                x = lvl.feats
                # brick backbone stages return None here (no cell
                # self-map exists — see MinkResNet.brick_stages)
                fine_nbr = (self_maps[i]
                            if self_maps is not None
                            and self_maps[i] is not None
                            else build_neighbor_map(lvl, lvl, 3, 1))
            cur_mask = lvl.mask

            out = _OutBlock(self.out_channels, name=f'out_block_{i}')(
                x, fine_nbr, cur_mask, train)
            scale = self.param(f'scale_{i}', nn.initializers.ones, (1, ))
            center_pred = conv_center(out)
            cls_pred = conv_cls(out)
            reg_final = conv_reg(out)
            reg_dist = jnp.clip(jnp.exp(scale * reg_final[..., :6]),
                                1e-3, None)
            bbox_pred = jnp.concatenate([reg_dist, reg_final[..., 6:]], -1)
            prune_score = jnp.where(cur_mask, jnp.max(cls_pred, -1), 0.0)

            sel_score = jnp.where(cur_mask, jnp.max(cls_pred, -1), -jnp.inf)
            (f_c, f_b, f_cl, f_p), m = _compact_by_score(
                [center_pred, bbox_pred, cls_pred, lvl.world_xyz()],
                sel_score, cur_mask,
                min(self.pts_prune_threshold, lvl.capacity))
            outs[i] = (f_c, f_b, f_cl, f_p, m)
            cur = lvl._replace(feats=x)

        # fine→coarse order (the reference reverses its lists, :200-206)
        centers = jnp.concatenate([outs[i][0] for i in range(n)], 1)
        bboxes = jnp.concatenate([outs[i][1] for i in range(n)], 1)
        clses = jnp.concatenate([outs[i][2] for i in range(n)], 1)
        points = jnp.concatenate([outs[i][3] for i in range(n)], 1)
        masks = jnp.concatenate([outs[i][4] for i in range(n)], 1)
        level_ids = jnp.concatenate([
            jnp.full((outs[i][0].shape[1], ), i, jnp.int32) for i in range(n)
        ])
        return centers, bboxes, clses, points, masks, level_ids

    # ------------------------------------------------------------------
    def bbox_pred_to_bbox(self, points: jnp.ndarray,
                          bbox_pred: jnp.ndarray) -> jnp.ndarray:
        """Face-distance coding → 9-DoF box (reference :563-625)."""
        d = bbox_pred[..., :6]
        if self.rot_param == 'ortho6d':
            rot = ortho_6d_to_matrix(bbox_pred[..., 6:9], bbox_pred[..., 9:12])
            euler = matrix_to_euler_angles(rot, 'ZXY')
        else:
            euler = bbox_pred[..., 6:9]
        shift = jnp.stack([(d[..., 1] - d[..., 0]) / 2,
                           (d[..., 3] - d[..., 2]) / 2,
                           (d[..., 5] - d[..., 4]) / 2], -1)
        flat_shift = shift.reshape(-1, 1, 3)
        flat_euler = euler.reshape(-1, 3)
        shift = rotation_3d_in_euler(flat_shift, flat_euler)[:, 0, :]
        shift = shift.reshape(points.shape)
        center = points + shift
        size = jnp.stack([d[..., 0] + d[..., 1], d[..., 2] + d[..., 3],
                          d[..., 4] + d[..., 5]], -1)
        return jnp.concatenate([center, size, euler], -1)

    # ------------------------------------------------------------------
    def get_targets(self, points: jnp.ndarray, level_ids: jnp.ndarray,
                    pts_mask: jnp.ndarray, gt_bboxes: jnp.ndarray,
                    gt_labels: jnp.ndarray, gt_mask: jnp.ndarray):
        """FCAF3D assignment for one sample (reference :682-766).

        Args: points (P, 3), level_ids (P,), pts_mask (P,),
        gt_bboxes (G, 9), gt_labels (G,), gt_mask (G,).
        Returns center_targets (P,), bbox_targets (P, 9),
        cls_targets (P,) with -1 = background.
        """
        P = points.shape[0]
        G = gt_bboxes.shape[0]
        FLOAT_MAX = 1e8
        boxes = jnp.broadcast_to(gt_bboxes[None], (P, G, 9))
        pts = jnp.broadcast_to(points[:, None, :], (P, G, 3))
        face = get_face_distances(pts, boxes)
        inside = (jnp.min(face, -1) > 0) & gt_mask[None, :] & \
            pts_mask[:, None]

        # best level per box
        n_levels = self.n_levels
        lvl_onehot = jax.nn.one_hot(level_ids, n_levels,
                                    dtype=jnp.float32)  # (P, L)
        n_pos = jnp.einsum('pl,pg->lg', lvl_onehot,
                           inside.astype(jnp.float32))  # (L, G)
        lower = n_pos < self.pts_assign_threshold
        lower_index = jnp.argmax(lower.astype(jnp.int32), 0) - 1
        lower_index = jnp.maximum(lower_index, 0)
        all_upper = jnp.all(~lower, 0)
        best_level = jnp.where(all_upper, n_levels - 1, lower_index)  # (G,)
        level_cond = level_ids[:, None] == best_level[None, :]

        centerness = get_centerness(face)
        centerness = jnp.where(inside & level_cond, centerness, -1.0)
        k = min(self.pts_center_threshold + 1, P)
        top_c = jax.lax.top_k(centerness.T, k)[0][:, -1]  # (G,)
        topk_cond = centerness > top_c[None, :]

        volumes = jnp.prod(gt_bboxes[:, 3:6], -1)[None, :]
        volumes = jnp.broadcast_to(volumes, (P, G))
        volumes = jnp.where(inside & level_cond & topk_cond, volumes,
                            FLOAT_MAX)
        min_vol = jnp.min(volumes, -1)
        min_ind = jnp.argmin(volumes, -1)

        center_targets = jnp.take_along_axis(centerness, min_ind[:, None],
                                             1)[:, 0]
        bbox_targets = gt_bboxes[min_ind]
        cls_targets = jnp.where(min_vol >= FLOAT_MAX, -1,
                                gt_labels[min_ind])
        return center_targets, bbox_targets, cls_targets

    # ------------------------------------------------------------------
    def loss(self, head_outs, gt_bboxes, gt_labels, gt_mask,
             axis_name: Optional[str] = None) -> Dict[str, jnp.ndarray]:
        centers, bboxes, clses, points, masks, level_ids = head_outs

        def per_sample(c, b, cl, p, m, gtb, gtl, gtm):
            ct, bt, clt = self.get_targets(p, level_ids, m, gtb, gtl, gtm)
            pos = (clt >= 0) & m
            n_pos = jnp.sum(pos)
            # cls: focal over one-hot (background → all-zero row)
            onehot = jax.nn.one_hot(jnp.where(clt >= 0, clt, 0),
                                    self.num_classes)
            onehot = onehot * (clt >= 0)[:, None]
            cls_loss = sigmoid_focal_loss(
                cl, onehot, m[:, None].astype(jnp.float32),
                avg_factor=jnp.maximum(n_pos, 1))
            # centerness BCE
            center_loss = binary_cross_entropy_with_logits(
                c[:, 0], ct, pos.astype(jnp.float32),
                avg_factor=jnp.maximum(n_pos, 1))
            # bbox rotated-IoU with centerness weights
            decoded = self.bbox_pred_to_bbox(p, b)
            denom = jnp.maximum(jnp.sum(ct * pos), 1e-6)
            bbox_loss = rotated_iou_3d_loss(
                decoded, bt, weight=ct * pos, avg_factor=denom)
            return center_loss, bbox_loss, cls_loss

        cl, bl, sl = jax.vmap(per_sample)(
            centers, bboxes, clses, points, masks, gt_bboxes, gt_labels,
            gt_mask)
        return {
            'loss_center': jnp.mean(cl) * self.center_loss_weight,
            'loss_bbox': jnp.mean(bl) * self.bbox_loss_weight,
            'loss_cls': jnp.mean(sl) * self.cls_loss_weight,
        }

    # ------------------------------------------------------------------
    def predict(self, head_outs):
        """Decoded boxes + per-class scores (device part); the NMS is
        host-side via `multiclass_nms_host`."""
        centers, bboxes, clses, points, masks, level_ids = head_outs
        scores = jax.nn.sigmoid(clses) * jax.nn.sigmoid(centers)
        decoded = self.bbox_pred_to_bbox(points, bboxes)
        return decoded, scores, masks


def multiclass_nms_host(boxes: np.ndarray, scores: np.ndarray,
                        mask: np.ndarray, score_thr: float = 0.01,
                        iou_thr: float = 0.5, nms_pre: int = 1000,
                        use_rotation: bool = True):
    """Per-class greedy NMS (reference :768-838), numpy + the exact-IoU
    nms3d op. Returns (boxes, scores, labels) arrays."""
    from ..ops.nms3d import nms3d
    import jax.numpy as jnp2
    boxes = boxes[mask]
    scores = scores[mask]
    if len(boxes) > nms_pre:
        keep = np.argsort(-scores.max(-1))[:nms_pre]
        boxes, scores = boxes[keep], scores[keep]
    out_b, out_s, out_l = [], [], []
    for c in range(scores.shape[1]):
        ids = scores[:, c] > score_thr
        if not ids.any():
            continue
        cb, cs = boxes[ids], scores[ids, c]
        keep = np.asarray(nms3d(jnp2.asarray(cb), jnp2.asarray(cs),
                                iou_threshold=iou_thr,
                                use_rotation=use_rotation))
        out_b.append(cb[keep])
        out_s.append(cs[keep])
        out_l.append(np.full(int(keep.sum()), c, np.int64))
    if out_b:
        return (np.concatenate(out_b), np.concatenate(out_s),
                np.concatenate(out_l))
    return (np.zeros((0, boxes.shape[-1] if len(boxes) else 9)),
            np.zeros((0, )), np.zeros((0, ), np.int64))


@MODELS.register_module()
class FCAF3DHeadRotMat(FCAF3DHead):
    """6-D rotation parameterization variant (reference :840-1750)."""
    rot_param: str = 'ortho6d'
    num_reg_outs: int = 12
