"""ProxyTransformation preshape module (the paper core), TPU-native.

Re-design of the reference `ProxyTransformationNormReverse`
(reference: embodiedscan/models/necks/preshape_norm_reverse_drop.py:22-672)
in flax/JAX with static shapes:

  * uniform grid prior inside the (masked) point AABB with margin
    (reference :33-51);
  * ball-query K points per center, MLP offsets (tanh × margin),
    re-query at clamped shifted centers (reference :53-67);
  * dynamic cluster dropout: drop the emptiest 30 % of clusters, then
    FPS-select a further set to drop down to M·(1-ddr) kept clusters
    (reference :352-420);
  * per-cluster PointNet proxies, 3 text- and 3 image-guided proxy
    blocks with two-stage linear proxy attention and interpolated
    positional biases (reference :179-330);
  * per-cluster 3×3 transform (image branch, BatchNorm-normalised) and
    translation (text branch), applied as R(x−c)+c+t and scattered back
    (reference :424-469).

TPU-first deviations from the reference (behaviour-preserving):
  * points stay a padded (B, N, 3) array with a validity mask — dropped
    clusters' points are *masked out*, not physically deleted (the
    reference returns ragged per-sample lists, :501-525); downstream
    voxelization respects the mask;
  * the reference's block loops feed `point_proxy` into *every* block
    and keep only the last result (:441-443,450-452 — earlier blocks are
    dead code kept alive by `find_unused_parameters=True`); we replicate
    that dataflow exactly and let XLA dead-code-eliminate the unused
    blocks; set `chain_blocks=True` for the (non-reference) chained
    variant.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn

from ..ops.ball_query import ball_query
from ..ops.fps import sample_farthest_points
from ..ops.common import masked_gather
from ..utils.registry import MODELS


def trunc_normal_init(std=0.02):
    def init(key, shape, dtype=jnp.float32):
        return std * jax.random.truncated_normal(key, -2.0, 2.0, shape, dtype)
    return init


class DropPath(nn.Module):
    """Per-sample stochastic depth (timm's DropPath)."""
    rate: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if self.rate == 0.0 or deterministic:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng('dropout')
        shape = (x.shape[0], ) + (1, ) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
        return jnp.where(mask, x / keep, 0.0)


class Mlp(nn.Module):
    hidden: int
    out: int
    drop: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = nn.Dense(self.hidden, dtype=self.dtype)(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dropout(self.drop, deterministic=deterministic)(x)
        x = nn.Dense(self.out, dtype=self.dtype)(x)
        x = nn.Dropout(self.drop, deterministic=deterministic)(x)
        return x.astype(jnp.float32)


class OffsetNetwork(nn.Module):
    """Predict per-cluster center offsets from ball-queried neighborhoods.

    Reference preshape_norm_reverse_drop.py:69-107: 1×1 conv (6→C) + BN +
    ReLU, mean over K (including padded slots, faithfully), 1×1 conv → 3.
    """
    hidden: int = 256
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, center, cluster, train: bool = False):
        # center (b, m, 3); cluster (b, m, k, 3) with zeros at padding
        rel = cluster - center[:, :, None, :]
        pad = jnp.all(cluster == 0.0, axis=-1, keepdims=True)
        rel = jnp.where(pad, 0.0, rel)
        x = jnp.concatenate([rel, cluster], axis=-1)  # (b, m, k, 6)
        x = nn.Dense(self.hidden, dtype=self.dtype)(x)
        x = x.astype(jnp.float32)
        x = nn.BatchNorm(use_running_average=not train, axis_name=None)(x)
        x = nn.relu(x)
        x = jnp.mean(x, axis=2)  # over K, padded slots included (faithful)
        x = nn.Dense(3, use_bias=False)(x)
        return x  # (b, m, 3)


class SimplifiedPointNet(nn.Module):
    """Max-pool PointNet over each cluster (reference :109-142)."""
    out: int = 256
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, center, cluster, train: bool = False):
        rel = cluster - center[:, :, None, :]
        pad = jnp.all(cluster == 0.0, axis=-1, keepdims=True)
        rel = jnp.where(pad, 0.0, rel)
        x = jnp.concatenate([rel, cluster], axis=-1)
        x = nn.Dense(self.out, dtype=self.dtype)(x)
        x = x.astype(jnp.float32)
        x = nn.BatchNorm(use_running_average=not train, axis_name=None)(x)
        x = nn.relu(x)
        return jnp.max(x, axis=2)  # (b, m, c)


class AttentionPool2d(nn.Module):
    """CLIP-style attention pooling over a feature map (reference :144-177)."""
    spacial_dim: int
    embed_dim: int
    num_heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        # x: (n, h, w, c)
        n, h, w, c = x.shape
        x = x.reshape(n, h * w, c)
        x = jnp.concatenate([jnp.mean(x, 1, keepdims=True), x], axis=1)
        pos = self.param('positional_embedding',
                         lambda k, s: jax.random.normal(k, s) / c ** 0.5,
                         (self.spacial_dim ** 2 + 1, c))
        x = x + pos[None]
        q = nn.Dense(c, dtype=self.dtype, name='q_proj')(x[:, :1])
        k = nn.Dense(c, dtype=self.dtype, name='k_proj')(x)
        v = nn.Dense(c, dtype=self.dtype, name='v_proj')(x)
        hd = c // self.num_heads
        q = q.reshape(n, 1, self.num_heads, hd).transpose(0, 2, 1, 3)
        k = k.reshape(n, -1, self.num_heads, hd).transpose(0, 2, 1, 3)
        v = v.reshape(n, -1, self.num_heads, hd).transpose(0, 2, 1, 3)
        attn = jnp.einsum('nhqd,nhkd->nhqk', q, k,
                          preferred_element_type=jnp.float32) / hd ** 0.5
        attn = jax.nn.softmax(attn, axis=-1).astype(self.dtype)
        out = jnp.einsum('nhqk,nhkd->nhqd', attn, v,
                         preferred_element_type=jnp.float32)
        out = out.transpose(0, 2, 1, 3).reshape(n, 1, c)[:, 0]
        return nn.Dense(self.embed_dim, dtype=self.dtype,
                        name='c_proj')(out).astype(jnp.float32)  # (n, c)


class ProxyAttention(nn.Module):
    """Two-stage linear proxy attention with interpolated cluster bias.

    Reference :179-257. Stage 1: proxies attend over clusters (no mask,
    as in the reference where the mask is commented out). Stage 2:
    clusters attend over proxies with the text mask. Complexity is
    O(n·l) instead of O(n²) — the reference's key trick for scaling the
    100k-point dimension (SURVEY §5.7).
    """
    dim: int = 256
    num_heads: int = 8
    qkv_bias: bool = False
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    num_cluster: int = 12 ** 3
    dynamic_drop_radio: float = 0.8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, proxy, mask=None, deterministic: bool = True):
        b, n, c = x.shape
        real_n = int(self.num_cluster * (1 - self.dynamic_drop_radio))
        if n != real_n:
            raise ValueError(
                f'ProxyAttention got {n} cluster tokens, but num_cluster'
                f'*(1-dynamic_drop_radio) = {self.num_cluster}*'
                f'(1-{self.dynamic_drop_radio}) = {real_n}; pass the '
                'same num_cluster/dynamic_drop_radio the dropout used')
        s = int(round(c ** 0.5))
        if s * s != c:
            raise ValueError(
                'ProxyAttention embed_dim must be a perfect square (the '
                'pc/pr biases factor as s x s with s = sqrt(dim), '
                f'reference :199-216); got {c} — use e.g. 256')
        nh = self.num_heads
        hd = c // nh

        pb = self.param('pb_bias', trunc_normal_init(), (1, n, 4, 4))
        pc = self.param('pc_bias', trunc_normal_init(), (1, n, s, 1))
        pr = self.param('pr_bias', trunc_normal_init(), (1, n, 1, s))
        # bilinear up-sample 4×4 → s×s (align_corners=False semantics,
        # like F.interpolate; jax.image.resize('linear') matches)
        bias1 = jax.image.resize(pb, (1, n, s, s), method='linear')
        bias1 = bias1.reshape(1, n, c)
        bias2 = (pc + pr).reshape(1, n, c)
        x = x + bias1 + bias2

        qkv = nn.Dense(3 * c, use_bias=self.qkv_bias, dtype=self.dtype,
                       name='qkv')(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        p = nn.Dense(c, dtype=self.dtype, name='proxy_proj')(proxy)
        l = p.shape[1]

        def heads(t):
            return t.reshape(b, -1, nh, hd).transpose(0, 2, 1, 3)

        q, k, v, p = heads(q), heads(k), heads(v), heads(p)
        scale = hd ** -0.5

        # stage 1: proxy as query over clusters (unmasked, faithful)
        pa = jnp.einsum('bhld,bhnd->bhln', (p * scale).astype(self.dtype),
                        k, preferred_element_type=jnp.float32)
        pa = jax.nn.softmax(pa, axis=-1).astype(self.dtype)
        pa = nn.Dropout(self.attn_drop, deterministic=deterministic)(pa)
        pv = jnp.einsum('bhln,bhnd->bhld', pa, v,
                        preferred_element_type=jnp.float32)

        # stage 2: proxy as key for clusters, text mask applied
        qa = jnp.einsum('bhnd,bhld->bhnl', (q * scale).astype(self.dtype),
                        p, preferred_element_type=jnp.float32)
        if mask is not None:
            qa = jnp.where(mask[:, None, None, :], qa, -1e9)
        qa = jax.nn.softmax(qa, axis=-1).astype(self.dtype)
        qa = nn.Dropout(self.attn_drop, deterministic=deterministic)(qa)
        out = jnp.einsum('bhnl,bhld->bhnd', qa, pv.astype(self.dtype),
                         preferred_element_type=jnp.float32)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, c)
        out = nn.Dense(c, dtype=self.dtype, name='proj')(out)
        out = out.astype(jnp.float32)
        out = nn.Dropout(self.proj_drop, deterministic=deterministic)(out)
        return out


class ProxyBlock(nn.Module):
    """Pre-norm attention + MLP block (reference :259-276)."""
    dim: int
    num_heads: int
    mlp_radio: float = 4.0
    qkv_bias: bool = False
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path: float = 0.0
    num_cluster: int = 12 ** 3
    dynamic_drop_radio: float = 0.8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, proxy, mask=None, deterministic: bool = True):
        h = nn.LayerNorm(name='norm1')(x)
        h = ProxyAttention(self.dim, self.num_heads, self.qkv_bias,
                           self.attn_drop, self.drop, self.num_cluster,
                           self.dynamic_drop_radio, self.dtype,
                           name='attn')(h, proxy, mask, deterministic)
        x = x + DropPath(self.drop_path)(h, deterministic)
        h = nn.LayerNorm(name='norm2')(x)
        h = Mlp(int(self.dim * self.mlp_radio), self.dim,
                self.drop, dtype=self.dtype, name='mlp')(h, deterministic)
        return x + DropPath(self.drop_path)(h, deterministic)


@MODELS.register_module()
class ProxyTransformationNormReverse(nn.Module):
    """Multi-modal point-cloud preshaping (ProxyTransformation, CVPR'25).

    Config values mirror the reference
    (configs/grounding/proxy-tiblock33-gs12-wbias-ddr0.6-clip.py:41):
    grid_size=12, text_blocks=3, img_blocks=3, dynamic_drop_radio=0.6,
    num_sub=30.
    """
    embed_dim: int = 256
    num_heads: int = 8
    n_points: int = 100000
    grid_size: int = 4
    text_blocks: int = 1
    img_blocks: int = 1
    dynamic_drop_radio: float = 0.8
    mlp_radio: float = 4.0
    qkv_bias: bool = False
    drop_rate: float = 0.2
    attn_drop_rate: float = 0.2
    drop_path_rate: float = 0.2
    num_sub: int = 30
    drop_radio: float = 0.2
    input_dim: int = 512
    img_spacial_dim: int = 15
    radius: float = 3.0
    margin: float = 4.0
    empty_drop: float = 0.3
    chain_blocks: bool = False  # True = chain blocks (improved, non-ref)
    # compute dtype for the attention/MLP stacks (geometry — ball query,
    # FPS, offsets, transforms — and all norm statistics stay float32)
    dtype: jnp.dtype = jnp.float32

    @property
    def num_cluster(self):
        return self.grid_size ** 3

    # ---------------- clustering ----------------
    def _grid_prior(self, points, mask):
        """Uniform grid centers inside the masked AABB (reference :33-51)."""
        big = 1e9
        pmin = jnp.min(jnp.where(mask[..., None], points, big), axis=1,
                       keepdims=True)
        pmax = jnp.max(jnp.where(mask[..., None], points, -big), axis=1,
                       keepdims=True)
        gs = self.grid_size
        lin = jnp.linspace(0.0, 1.0, gs)
        gx, gy, gz = jnp.meshgrid(lin, lin, lin, indexing='ij')
        grid = jnp.stack([gx, gy, gz], -1).reshape(1, -1, 3)
        centers = pmin + self.margin + grid * (pmax - pmin - 2 * self.margin)
        return centers, pmin, pmax

    def _deformable_cluster(self, points, mask, train):
        """Grid prior → ball query → offsets → re-query (reference :53-67)."""
        centers, pmin, pmax = self._grid_prior(points, mask)
        _, temp_cluster = ball_query(centers, points, K=self.num_sub,
                                     radius=self.radius, points_mask=mask)
        offsets = OffsetNetwork(self.embed_dim, dtype=self.dtype,
                                name='get_offsets')(
            centers, temp_cluster, train)
        offsets = jnp.tanh(offsets) * self.margin
        new_centers = jnp.clip(centers + offsets, pmin, pmax)
        idx, cluster = ball_query(new_centers, points, K=self.num_sub,
                                  radius=self.radius, points_mask=mask)
        return new_centers, cluster, idx

    def _dynamic_dropout(self, cluster, center, idx, train=False):
        """Drop emptiest clusters, then FPS-selected ones (reference :352-420).

        With `rngs={'fps': key}` at apply time (train only), the FPS
        start point is random per sample — pytorch3d's
        `sample_farthest_points` default, which the reference inherits
        at :393; without it the start is deterministic (the reference's
        own naive-FPS oracle semantics)."""
        B, M, K, _ = cluster.shape
        pad_counts = jnp.sum(idx == -1, axis=2)  # (B, M)
        temp_keep = M - int(M * self.empty_drop)
        order = jnp.argsort(pad_counts, axis=1)  # ascending, stable
        keep1 = order[:, :temp_keep]
        center1 = jnp.take_along_axis(center, keep1[..., None], axis=1)
        cluster1 = jnp.take_along_axis(cluster, keep1[..., None, None], axis=1)
        idx1 = jnp.take_along_axis(idx, keep1[..., None], axis=1)

        num_keep = int(M * (1 - self.dynamic_drop_radio))
        num_drop = temp_keep - num_keep
        # FPS selects the *dropped* clusters (faithful to reference :393)
        fps_rng = (self.make_rng('fps')
                   if train and self.has_rng('fps') else None)
        _, fps_drop = sample_farthest_points(center1, K=num_drop,
                                             rng=fps_rng)
        keep_mask = jnp.ones((B, temp_keep), bool)
        keep_mask = jax.vmap(lambda m, d: m.at[d].set(False))(keep_mask,
                                                              fps_drop)
        # stable argsort: kept indices first, original order preserved
        keep_order = jnp.argsort(~keep_mask, axis=1, stable=True)
        keep2 = keep_order[:, :num_keep]

        new_center = jnp.take_along_axis(center1, keep2[..., None], axis=1)
        new_cluster = jnp.take_along_axis(cluster1, keep2[..., None, None],
                                          axis=1)
        new_idx = jnp.take_along_axis(idx1, keep2[..., None], axis=1)
        drop_idx = jnp.take_along_axis(idx1, fps_drop[..., None],
                                       axis=1).reshape(B, -1)
        return new_cluster, new_center, new_idx, drop_idx

    # ---------------- proxies ----------------
    def _img_proxy(self, img_feat, train):
        """Per-view pooled image tokens (reference :335-342)."""
        B, V, H, W, C = img_feat.shape
        x = img_feat.reshape(B * V, H, W, C)
        x = nn.Dense(self.embed_dim, dtype=self.dtype,
                     name='channel_mapper')(x)
        x = AttentionPool2d(self.img_spacial_dim, self.embed_dim,
                            self.num_heads, dtype=self.dtype,
                            name='attn_pool2d')(x)
        x = nn.LayerNorm(name='norm_img')(x)
        return x.reshape(B, V, self.embed_dim)

    # ---------------- forward ----------------
    @nn.compact
    def __call__(self,
                 points: jnp.ndarray,
                 points_mask: jnp.ndarray,
                 text_feats: jnp.ndarray,
                 text_mask: jnp.ndarray,
                 img_feat: jnp.ndarray,
                 train: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Args:
            points: (B, N, 3) padded point clouds.
            points_mask: (B, N) bool validity.
            text_feats: (B, L, C) text token features.
            text_mask: (B, L) bool token validity.
            img_feat: (B, V, H, W, C_img) deepest 2D level (NHWC).
        Returns:
            (new_points (B, N, 3), new_mask (B, N)): preshaped cloud with
            dropped-cluster points masked out.
        """
        det = not train
        center, cluster, idx = self._deformable_cluster(points, points_mask,
                                                        train)
        cluster, center, idx, drop_idx = self._dynamic_dropout(
            cluster, center, idx, train)
        b, m, k, _ = cluster.shape

        point_proxy = SimplifiedPointNet(self.embed_dim, dtype=self.dtype,
                                         name='simple_encoder')(
                                             center, cluster, train)

        dpr_t = np.linspace(0, self.drop_path_rate, self.text_blocks)
        dpr_i = np.linspace(0, self.drop_path_rate, self.img_blocks)

        # text-guided branch → per-cluster translation
        tx = point_proxy
        for i in range(self.text_blocks):
            inp = tx if self.chain_blocks else point_proxy
            tx = ProxyBlock(self.embed_dim, self.num_heads, self.mlp_radio,
                            self.qkv_bias, self.drop_rate,
                            self.attn_drop_rate, float(dpr_t[i]),
                            self.num_cluster, self.dynamic_drop_radio,
                            self.dtype,
                            name=f'textformer_{i}')(inp, text_feats,
                                                    text_mask, det)
            tx = nn.LayerNorm(name=f'text_norm_{i}')(tx)
        translate = nn.Dense(3, name='text_trans')(tx)
        translate = nn.BatchNorm(use_running_average=det,
                                 name='text_trans_norm')(translate)

        # image-guided branch → per-cluster 3×3 transform
        img_proxy = self._img_proxy(img_feat, train)
        ix = point_proxy
        for i in range(self.img_blocks):
            inp = ix if self.chain_blocks else point_proxy
            ix = ProxyBlock(self.embed_dim, self.num_heads, self.mlp_radio,
                            self.qkv_bias, self.drop_rate,
                            self.attn_drop_rate, float(dpr_i[i]),
                            self.num_cluster, self.dynamic_drop_radio,
                            self.dtype,
                            name=f'imgformer_{i}')(inp, img_proxy, None, det)
            ix = nn.LayerNorm(name=f'img_norm_{i}')(ix)
        transform = nn.Dense(9, name='img_trans')(ix)
        transform = nn.BatchNorm(use_running_average=det,
                                 name='img_trans_norm')(transform)

        transform = transform.reshape(b, m, 3, 3)
        # R (x - c) + c + t   (reference :459-462)
        rel = cluster - center[:, :, None, :]
        new_cluster = jnp.einsum('bmij,bmkj->bmki', transform, rel) \
            + center[:, :, None, :] + translate[:, :, None, :]

        # scatter transformed points back at valid slots (reference :465)
        new_points = _scatter_replace(points, idx, new_cluster)
        # mask out points of dropped clusters (reference :467, :501-525 —
        # there they are physically removed; we keep static shapes)
        new_mask = _mask_drop(points_mask, drop_idx)
        return new_points, new_mask


def _scatter_replace(points: jnp.ndarray, idx: jnp.ndarray,
                     cluster: jnp.ndarray) -> jnp.ndarray:
    """Replace points[b, idx] with cluster values where idx >= 0.

    Equivalent of reference `pt_replace` (:472-498) as a vmapped scatter.
    """
    B, M, K = idx.shape

    def one(pts, ix, cl):
        ix = ix.reshape(-1)
        cl = cl.reshape(-1, 3)
        valid = ix >= 0
        safe = jnp.where(valid, ix, pts.shape[0])  # OOB drops the write
        return pts.at[safe].set(jnp.where(valid[:, None], cl, 0.0),
                                mode='drop')

    return jax.vmap(one)(points, idx, cluster)


def _mask_drop(mask: jnp.ndarray, drop_idx: jnp.ndarray) -> jnp.ndarray:
    """Set mask[b, drop_idx] = False where drop_idx >= 0."""

    def one(m, d):
        safe = jnp.where(d >= 0, d, m.shape[0])
        return m.at[safe].set(False, mode='drop')

    return jax.vmap(one)(mask, drop_idx)
