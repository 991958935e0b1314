import numpy as np
import jax
import jax.numpy as jnp
import pytest

from proxytransformation_tpu.ops.sparse import voxelize_points
from proxytransformation_tpu.models.sparse_resnet import MinkResNet
from proxytransformation_tpu.models.sparse_neck import MinkNeck


def _voxel_input(rng, B=2, N=2000, C=3):
    pts = rng.uniform(0, 2.0, (B, N, 3)).astype(np.float32)
    mask = np.ones((B, N), bool)
    mask[:, N - 100:] = False
    lvl = voxelize_points(jnp.asarray(pts), jnp.asarray(mask),
                          jnp.asarray(pts), voxel_size=0.02,
                          capacity=N, extent=(128, 128, 128))
    return lvl


CAPS = (1500, 1200, 800, 400, 200, 100)


def test_mink_resnet34_shapes():
    rng = np.random.RandomState(0)
    lvl = _voxel_input(rng)
    model = MinkResNet(depth=34, in_channels=3, capacities=CAPS)
    # jitted init/apply: one compiled program each instead of thousands
    # of individually-compiled eager ops (3x faster on this 1-core CPU)
    variables = jax.jit(
        lambda k, l: model.init(k, l, train=False))(jax.random.PRNGKey(0),
                                                    lvl)
    outs = jax.jit(lambda v, l: model.apply(v, l, train=False))(variables,
                                                                lvl)
    assert len(outs) == 4
    chans = [64, 128, 256, 512]
    strides = [8, 16, 32, 64]
    for o, c, s in zip(outs, chans, strides):
        assert o.feats.shape[-1] == c
        assert o.stride == s
        assert int(o.mask.sum()) > 0
        # valid features are finite, invalid are zero
        f = np.asarray(o.feats)
        m = np.asarray(o.mask)
        assert np.all(np.isfinite(f))
        assert np.all(f[~m] == 0)


@pytest.fixture(scope='module')
def backbone14_outs():
    """One compiled depth-14 backbone forward shared by the
    monotonic-counts and neck tests (each compile is ~1 min on this
    1-core CPU image)."""
    rng = np.random.RandomState(1)
    lvl = _voxel_input(rng)
    model = MinkResNet(depth=14, in_channels=3, capacities=CAPS)
    variables = jax.jit(
        lambda k, l: model.init(k, l, train=False))(jax.random.PRNGKey(0),
                                                    lvl)
    outs = jax.jit(lambda v, l: model.apply(v, l, train=False))(variables,
                                                                lvl)
    return outs


def test_mink_resnet_voxel_counts_monotonic(backbone14_outs):
    counts = [int(o.mask[0].sum()) for o in backbone14_outs]
    assert all(a >= b for a, b in zip(counts, counts[1:]))


def test_mink_neck_shapes_and_mask(backbone14_outs):
    outs = backbone14_outs
    neck = MinkNeck(num_classes=1, in_channels=(64, 128, 256, 512),
                    out_channels=32, voxel_size=0.02,
                    pts_prune_threshold=64)
    nvars = jax.jit(
        lambda k, o: neck.init(k, o, train=False))(jax.random.PRNGKey(1),
                                                   outs)
    feats, scores, xyz, mask = jax.jit(
        lambda v, o: neck.apply(v, o, train=False))(nvars, outs)
    B = 2
    P = feats.shape[1]
    assert feats.shape == (B, P, 32)
    assert scores.shape == (B, P, 1)
    assert xyz.shape == (B, P, 3)
    assert mask.shape == (B, P)
    assert int(mask.sum()) > 0
    # each level contributes at most pts_prune_threshold valid rows
    assert np.all(np.asarray(mask).sum(1) <= 4 * 64)
    # xyz of valid rows lie in the scene bounds
    x = np.asarray(xyz)
    m = np.asarray(mask)
    assert np.all(x[m] >= -0.1) and np.all(x[m] <= 2.7)


def test_backbone_neck_grad_flow():
    rng = np.random.RandomState(3)
    lvl = _voxel_input(rng, N=800)
    caps = (600, 500, 300, 150, 80, 40)
    backbone = MinkResNet(depth=14, in_channels=3, capacities=caps)
    neck = MinkNeck(num_classes=1, in_channels=(64, 128, 256, 512),
                    out_channels=16, voxel_size=0.02, pts_prune_threshold=32)
    bvars = jax.jit(
        lambda k, l: backbone.init(k, l, train=False))(
            jax.random.PRNGKey(0), lvl)
    outs = jax.jit(
        lambda v, l: backbone.apply(v, l, train=False))(bvars, lvl)
    nvars = jax.jit(
        lambda k, o: neck.init(k, o, train=False))(jax.random.PRNGKey(1),
                                                   outs)

    def loss(bp, np_):
        outs = backbone.apply({'params': bp,
                               'batch_stats': bvars['batch_stats']},
                              lvl, train=False)
        feats, scores, xyz, mask = neck.apply(
            {'params': np_, 'batch_stats': nvars['batch_stats']}, outs,
            train=False)
        return jnp.sum(jnp.where(mask[..., None], feats, 0.0) ** 2)

    gb, gn = jax.jit(jax.grad(loss, argnums=(0, 1)))(bvars['params'],
                                                     nvars['params'])
    leaves = jax.tree_util.tree_leaves(gb) + jax.tree_util.tree_leaves(gn)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in leaves)
    # stem conv must receive gradient
    assert float(jnp.abs(gb['conv1']['kernel']).sum()) > 0
