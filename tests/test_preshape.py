import numpy as np
import jax
import jax.numpy as jnp
import pytest

from proxytransformation_tpu.models.preshape import (
    ProxyTransformationNormReverse, _scatter_replace, _mask_drop,
    AttentionPool2d, ProxyBlock)


def _make_model(**kw):
    defaults = dict(embed_dim=64, num_heads=4, n_points=512, grid_size=4,
                    text_blocks=2, img_blocks=2, dynamic_drop_radio=0.5,
                    num_sub=8, input_dim=32, img_spacial_dim=5, radius=1.0,
                    margin=0.5)
    defaults.update(kw)
    return ProxyTransformationNormReverse(**defaults)


def _inputs(rng, B=2, N=512, L=7, V=3, C_img=32, S=5):
    points = rng.uniform(-4, 4, (B, N, 3)).astype(np.float32)
    mask = np.ones((B, N), bool)
    mask[:, N - 50:] = False
    text = rng.randn(B, L, 64).astype(np.float32)
    tmask = np.ones((B, L), bool)
    tmask[:, 5:] = False
    img = rng.randn(B, V, S, S, C_img).astype(np.float32)
    return (jnp.asarray(points), jnp.asarray(mask), jnp.asarray(text),
            jnp.asarray(tmask), jnp.asarray(img))


def test_preshape_forward_shapes():
    rng = np.random.RandomState(0)
    model = _make_model()
    args = _inputs(rng)
    variables = model.init(jax.random.PRNGKey(0), *args, train=False)
    new_pts, new_mask = model.apply(variables, *args, train=False)
    assert new_pts.shape == (2, 512, 3)
    assert new_mask.shape == (2, 512)
    # some clusters were dropped -> strictly fewer valid points possible,
    # never more
    assert int(new_mask.sum()) <= int(args[1].sum())
    # originally-invalid points stay invalid
    assert not np.any(np.asarray(new_mask)[:, 512 - 50:])


def test_preshape_jit_and_grad():
    rng = np.random.RandomState(1)
    model = _make_model(text_blocks=1, img_blocks=1)
    args = _inputs(rng)
    variables = model.init(jax.random.PRNGKey(0), *args, train=False)

    @jax.jit
    def loss_fn(params):
        pts, msk = model.apply({'params': params,
                                'batch_stats': variables['batch_stats']},
                               *args, train=False)
        return jnp.sum(jnp.where(msk[..., None], pts, 0.0) ** 2)

    g = jax.grad(loss_fn)(variables['params'])
    flat = jax.tree_util.tree_leaves(g)
    assert all(np.all(np.isfinite(np.asarray(x))) for x in flat)
    # img branch transform params must receive gradient
    gsum = np.asarray(jnp.sum(jnp.abs(g['img_trans']['kernel'])))
    assert gsum > 0


def test_preshape_train_mode_updates_batch_stats():
    rng = np.random.RandomState(2)
    model = _make_model(text_blocks=1, img_blocks=1)
    args = _inputs(rng)
    variables = model.init(jax.random.PRNGKey(0), *args, train=True)
    out, mutated = model.apply(variables, *args, train=True,
                               mutable=['batch_stats'],
                               rngs={'dropout': jax.random.PRNGKey(1)})
    assert 'batch_stats' in mutated


def test_scatter_replace():
    pts = jnp.zeros((1, 6, 3))
    idx = jnp.asarray([[[0, 2, -1]]])
    cl = jnp.ones((1, 1, 3, 3)) * 5.0
    out = np.asarray(_scatter_replace(pts, idx, cl))
    np.testing.assert_allclose(out[0, 0], 5.0)
    np.testing.assert_allclose(out[0, 2], 5.0)
    np.testing.assert_allclose(out[0, 1], 0.0)


def test_mask_drop():
    mask = jnp.ones((1, 5), bool)
    out = np.asarray(_mask_drop(mask, jnp.asarray([[1, 3, -1]])))
    np.testing.assert_array_equal(out[0], [True, False, True, False, True])


def test_attention_pool2d_shape():
    m = AttentionPool2d(spacial_dim=5, embed_dim=32, num_heads=4)
    x = jnp.ones((6, 5, 5, 32))
    v = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(v, x)
    assert out.shape == (6, 32)


def test_proxy_block_masked_tokens_ignored():
    """Masked text tokens must not influence the output."""
    m = ProxyBlock(dim=64, num_heads=4, num_cluster=4 ** 3,
                   dynamic_drop_radio=0.5)
    rng = np.random.RandomState(3)
    n = int(4 ** 3 * 0.5)
    x = jnp.asarray(rng.randn(1, n, 64), jnp.float32)
    proxy = jnp.asarray(rng.randn(1, 6, 64), jnp.float32)
    mask = jnp.asarray([[True, True, True, False, False, False]])
    v = m.init(jax.random.PRNGKey(0), x, proxy, mask)
    out1 = m.apply(v, x, proxy, mask)
    proxy2 = proxy.at[:, 3:].set(123.0)
    out2 = m.apply(v, x, proxy2, mask)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=2e-5)
