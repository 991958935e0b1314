"""End-to-end ego-centric 3D visual grounder (the flagship model).

Re-design of the reference `SparseFeatureFusion3DGrounderPreshape`
(reference: models/detectors/sparse_featfusion_grounder_preshape.py:
35-1074) as one jittable flax module with static shapes:

  imgs (B,V,H,W,3) ──ResNet50──► 4 image levels ──┐
  input_ids (B,L) ──CLIP text──► text feats ──────┤
  points (B,N,3)+mask ──ProxyTransformation◄──────┘  (preshape, :385)
      │ voxelize (1 cm, xyz feats, :388-397)
      ▼
  MinkResNet34 ──► 4 sparse levels ──2D→3D painting (:404-479)──►
  MinkNeck FPN+prune (:469-482) ──► (B, 4·P, C) tokens
      │ pre_decoder: top-256 queries by contrastive score (:498-580)
      ▼
  6-layer decoder w/ box refinement (:582-621) ──► GroundingHead
      loss (:623-705) / predict (:707-794)

Batch dict contract (all padded, masked):
  imgs, points, points_mask, input_ids, text_mask, proj_mats (B,V,4,4),
  views_mask, img_scale_factor (B,2) | None, aug params
  (pcd_rotation/pcd_scale_factor/pcd_trans) | None, and for loss:
  gt_bboxes (B,G,9), gt_masks (B,G), positive_maps (B,G,256).
"""
from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops.sparse import voxelize_points
from ..utils.registry import MODELS
from .decoder import SparseFeatureFusionTransformerDecoder
from .grounding_head import GroundingHead
from .point_fusion import apply_inverse_aug, batch_point_sample
from .preshape import ProxyTransformationNormReverse
from .resnet import ResNet
from .sparse_neck import MinkNeck
from .sparse_resnet import MinkResNet
from .text_encoder import CLIPTextEncoder


@MODELS.register_module()
class SparseFeatureFusion3DGrounderPreshape(nn.Module):
    # top-level knobs (reference config configs/...clip.py:19-100)
    num_queries: int = 256
    voxel_size: float = 0.01
    use_xyz_feat: bool = True
    max_text_len: int = 256
    n_points: int = 100_000
    use_preshape: bool = True  # False = SparseFeatureFusion3DGrounder
    # baseline (reference models/detectors/sparse_featfusion_grounder.py)

    # 2D backbone
    img_base_channels: int = 16
    img_depth: int = 50

    # text encoder — t_type selects the tower family as in the reference
    # (:131-277); 'clip' builds CLIPTextEncoder from the explicit
    # width/layers/heads below, anything else goes through
    # text_variants.build_text_encoder
    t_type: str = 'clip'
    text_width: int = 768
    text_layers: int = 12
    text_heads: int = 12
    freeze_text_encoder: bool = True  # via optimizer mask (lr_mult=0)

    # preshape
    grid_size: int = 12
    text_blocks: int = 3
    img_blocks: int = 3
    dynamic_drop_radio: float = 0.6
    num_sub: int = 30
    img_spacial_dim: int = 15  # deepest image level size = H_img / 32

    # sparse 3D backbone / neck
    backbone3d_depth: int = 34
    sparse_capacities: Sequence[int] = (100_000, 80_000, 50_000, 20_000,
                                        6_000, 2_000)
    voxel_extent: Sequence[int] = (1280, 1280, 512)
    neck_out_channels: int = 256
    pts_prune_threshold: int = 1000

    # decoder
    decoder_layers: int = 6
    embed_dims: int = 256
    num_heads: int = 8
    ffn_channels: int = 2048

    # rematerialize ResNet / sparse / decoder blocks (jax.checkpoint) —
    # trades recompute for activation + XLA-compile memory; needed for
    # the reference B=6 per-chip train batch
    remat: bool = False
    # checkpoint the 2D→3D painting gathers: their per-level (V, N, C)
    # stash is among the largest backward residuals, and recompute is
    # cheap (index gathers). None → follow `remat`.
    remat_painting: Optional[bool] = None
    # 'bfloat16' runs the matmul-heavy submodules (2D ResNet, preshape
    # attention, sparse stages, painting gathers, decoder) in bf16 —
    # the TPU-idiomatic AMP analog of the reference's --amp flag
    # (reference tools/train.py:94-105). Geometry (voxelize, neighbor
    # maps, projections, box math), norm statistics, scores and losses
    # stay float32. Halves activation memory; required for the
    # reference per-chip train batch (B=6) on a 16 GB v5e.
    compute_dtype: str = 'float32'

    def setup(self):
        cdt = jnp.dtype(self.compute_dtype)
        self.backbone = ResNet(depth=self.img_depth,
                               base_channels=self.img_base_channels,
                               remat=self.remat, dtype=cdt)
        if self.t_type == 'clip':
            self.text_encoder = CLIPTextEncoder(width=self.text_width,
                                                layers=self.text_layers,
                                                heads=self.text_heads)
        else:
            from .text_variants import build_text_encoder
            self.text_encoder, _ = build_text_encoder(self.t_type)
        self.text_feat_map = nn.Dense(self.embed_dims)
        self.preshape = ProxyTransformationNormReverse(
            embed_dim=self.embed_dims, num_heads=self.num_heads,
            n_points=self.n_points, grid_size=self.grid_size,
            text_blocks=self.text_blocks, img_blocks=self.img_blocks,
            dynamic_drop_radio=self.dynamic_drop_radio,
            num_sub=self.num_sub, input_dim=self.img_base_channels * 32,
            img_spacial_dim=self.img_spacial_dim, dtype=cdt)
        self.backbone_3d = MinkResNet(depth=self.backbone3d_depth,
                                      in_channels=3,
                                      capacities=tuple(
                                          self.sparse_capacities),
                                      remat=self.remat, dtype=cdt)
        img_chans = [self.img_base_channels * 4 * 2 ** i for i in range(4)]
        mink_chans = [64, 128, 256, 512]
        self.neck_3d = MinkNeck(
            num_classes=1,
            in_channels=tuple(m + i for m, i in zip(mink_chans, img_chans)),
            out_channels=self.neck_out_channels,
            voxel_size=self.voxel_size,
            pts_prune_threshold=self.pts_prune_threshold)
        self.decoder = SparseFeatureFusionTransformerDecoder(
            num_layers=self.decoder_layers, embed_dims=self.embed_dims,
            num_heads=self.num_heads,
            feedforward_channels=self.ffn_channels, remat=self.remat,
            dtype=cdt)
        self.bbox_head = GroundingHead(
            num_classes=self.max_text_len, embed_dims=self.embed_dims,
            max_text_len=self.max_text_len,
            num_pred_layer=self.decoder_layers + 1)

    # ------------------------------------------------------------------
    def encode_text(self, input_ids, text_mask):
        feats = self.text_encoder(input_ids, text_mask)
        if self.freeze_text_encoder:
            feats = jax.lax.stop_gradient(feats)
        return self.text_feat_map(feats)

    def extract_feat(self, batch: Dict[str, Any], text_feats, train: bool):
        imgs = batch['imgs']  # (B, V, H, W, 3)
        B, V, H, W, _ = imgs.shape
        img_feats = self.backbone(imgs.reshape(B * V, H, W, 3))
        img_feats = [
            f.reshape((B, V) + f.shape[1:]) for f in img_feats
        ]  # NHWC per level

        # preshape the cloud with text + deepest image level (:385)
        xyz = batch['points'][..., :3]
        if self.use_preshape:
            points, points_mask = self.preshape(
                xyz, batch['points_mask'], text_feats,
                batch['text_mask'], img_feats[-1], train=train)
        else:
            points, points_mask = xyz, batch['points_mask']

        if self.use_xyz_feat:
            feats = points
        else:
            # voxel features = the non-xyz point channels (e.g. color);
            # requires the preprocessor to have kept them
            if batch['points'].shape[-1] <= 3:
                raise ValueError(
                    'use_xyz_feat=False needs points with >3 channels '
                    f'(got {batch["points"].shape[-1]}); keep color '
                    'channels in the pipeline or set use_xyz_feat=True')
            feats = batch['points'][..., 3:]
        lvl0 = voxelize_points(points, points_mask, feats,
                               voxel_size=self.voxel_size,
                               capacity=self.n_points,
                               extent=tuple(self.voxel_extent))
        levels, self_maps = self.backbone_3d(lvl0, train=train,
                                             return_self_maps=True)

        # 2D→3D painting per level (:404-479), injected into the neck so
        # it runs on the post-prune compacted voxel sets (painting is
        # pointwise per voxel — compaction commutes with it exactly)
        paint = jax.vmap(
            lambda imf, p, proj, vm, vmask: batch_point_sample(
                imf, p, proj, (H, W),
                img_scale_factor=None, valid_mask=vm, views_mask=vmask,
                aligned=False))
        if (self.remat if self.remat_painting is None
                else self.remat_painting):
            paint = jax.checkpoint(paint)

        def paint_fn(xyz, vmask, lvl_idx):
            inv = jax.vmap(apply_inverse_aug)(
                xyz,
                batch.get('pcd_rotation'),
                batch.get('pcd_scale_factor'),
                batch.get('pcd_trans'),
                batch.get('pcd_flip_x'),
                batch.get('pcd_flip_y'))
            return paint(img_feats[lvl_idx], inv, batch['proj_mats'],
                         vmask, batch['views_mask'])

        return self.neck_3d(levels, train=train, self_maps=self_maps,
                            paint_fn=paint_fn)

    # ------------------------------------------------------------------
    def pre_decoder(self, feats, scores_unused, xyz, feats_mask, text_feats,
                    text_mask):
        """Top-k query selection by contrastive score (:498-580)."""
        enc_cls = self.bbox_head.cls_branches[self.decoder_layers](
            feats, text_feats, text_mask, feats_mask)
        sel_score = jnp.max(jnp.where(jnp.isfinite(enc_cls), enc_cls, -1e9),
                            axis=-1)  # (B, P)
        sel_score = jnp.where(feats_mask, sel_score, -jnp.inf)
        topk = min(self.num_queries, feats.shape[1])
        _, topk_idx = jax.lax.top_k(sel_score, topk)

        bbox_preds = self.bbox_head.reg_branches[self.decoder_layers](feats)
        pred_bboxes = self.bbox_head.bbox_pred_to_bbox(xyz, bbox_preds)

        gather = lambda a: jnp.take_along_axis(
            a, topk_idx[..., None].astype(jnp.int32), axis=1)
        query_coords = gather(xyz)
        topk_bboxes = jax.lax.stop_gradient(gather(pred_bboxes))
        query_feats = gather(feats)
        query_mask = jnp.take_along_axis(feats_mask, topk_idx, axis=1)
        return (query_feats, query_coords, topk_bboxes, query_mask)

    def forward_transformer(self, feats, scores, xyz, feats_mask, text_feats,
                            text_mask, train: bool):
        query, query_coords, pred_bboxes, query_mask = self.pre_decoder(
            feats, scores, xyz, feats_mask, text_feats, text_mask)
        hidden, all_boxes = self.decoder(
            query, feats, ~feats_mask, query_coords, xyz, pred_bboxes,
            text_feats, ~text_mask,
            reg_branch_fn=lambda q, lid=None: self.bbox_head.reg_branches[
                0 if self.bbox_head.share_pred_layer else lid](q),
            bbox_coder_fn=self.bbox_head.bbox_pred_to_bbox,
            feats_mask=feats_mask, query_mask=query_mask,
            deterministic=not train)
        return hidden, all_boxes, query_mask

    # ------------------------------------------------------------------
    def __call__(self, batch: Dict[str, Any], mode: str = 'predict',
                 train: Optional[bool] = None,
                 axis_name: Optional[str] = None):
        if train is None:
            train = mode == 'loss'
        text_feats = self.encode_text(batch['input_ids'], batch['text_mask'])
        feats, scores, xyz, feats_mask = self.extract_feat(batch, text_feats,
                                                           train)
        hidden, all_boxes, query_mask = self.forward_transformer(
            feats, scores, xyz, feats_mask, text_feats, batch['text_mask'],
            train)
        if mode == 'loss':
            return self.bbox_head.loss(
                hidden, all_boxes, text_feats, batch['text_mask'],
                batch['gt_bboxes'], batch['gt_masks'],
                batch['positive_maps'], query_mask, axis_name)
        boxes, box_scores = self.bbox_head.predict(
            hidden, all_boxes, text_feats, batch['text_mask'], query_mask)
        return {'bboxes_3d': boxes, 'scores_3d': box_scores,
                'query_mask': query_mask}


@MODELS.register_module()
class SparseFeatureFusion3DGrounder(SparseFeatureFusion3DGrounderPreshape):
    """Baseline grounder without the preshape module (reference
    models/detectors/sparse_featfusion_grounder.py:31-767)."""
    use_preshape: bool = False
