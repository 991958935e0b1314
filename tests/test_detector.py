import numpy as np
import jax
import jax.numpy as jnp
import pytest

from proxytransformation_tpu.models.detector import (
    SparseFeatureFusion3DGrounderPreshape)


def tiny_model():
    return SparseFeatureFusion3DGrounderPreshape(
        num_queries=16,
        voxel_size=0.05,
        n_points=1024,
        img_base_channels=4,     # image levels 16/32/64/128
        text_width=32, text_layers=2, text_heads=4,
        grid_size=4, text_blocks=1, img_blocks=1,
        dynamic_drop_radio=0.5, num_sub=8,
        backbone3d_depth=14,  # ME ResNet14 analog — halves the XLA CPU
        # compile time of every full-model test; depth 18 stays covered
        # by __graft_entry__ (driver entry + multichip dryrun) and
        # test_torch_convert, depth 34 by test_sparse_models
        sparse_capacities=(1024, 800, 512, 256, 128, 64),
        voxel_extent=(128, 128, 128),
        neck_out_channels=64,
        pts_prune_threshold=64,
        decoder_layers=2, embed_dims=64, num_heads=4, ffn_channels=128,
        img_spacial_dim=2,
        max_text_len=64)


def tiny_batch(rng, B=2, V=2, H=64, W=64, N=1024, L=8, G=3):
    proj = np.zeros((B, V, 4, 4), np.float32)
    # simple pinhole looking down +z with offset
    for b in range(B):
        for v in range(V):
            proj[b, v] = np.array([[50, 0, W / 2, 0],
                                   [0, 50, H / 2, 0],
                                   [0, 0, 1, 0],
                                   [0, 0, 0, 1]], np.float32)
    gt = np.concatenate([
        rng.uniform(0.5, 2.5, (B, G, 3)), rng.uniform(0.3, 1.0, (B, G, 3)),
        rng.uniform(-0.5, 0.5, (B, G, 3))
    ], -1).astype(np.float32)
    pm = np.zeros((B, G, 64), np.float32)
    pm[:, :, 1] = 1.0
    batch = {
        'imgs': jnp.asarray(rng.randn(B, V, H, W, 3).astype(np.float32)),
        'points': jnp.asarray(
            rng.uniform(0, 3.0, (B, N, 3)).astype(np.float32)),
        'points_mask': jnp.ones((B, N), bool),
        'input_ids': jnp.asarray(rng.randint(0, 49408, (B, L)), jnp.int32),
        'text_mask': jnp.asarray(np.arange(L)[None] < L - 2).repeat(B, 0),
        'proj_mats': jnp.asarray(proj),
        'views_mask': jnp.ones((B, V), bool),
        'gt_bboxes': jnp.asarray(gt),
        'gt_masks': jnp.asarray(np.arange(G)[None].repeat(B, 0) < [[2], [3]]),
        'positive_maps': jnp.asarray(pm),
    }
    return batch


@pytest.fixture(scope='module')
def model_and_vars():
    rng = np.random.RandomState(0)
    model = tiny_model()
    batch = tiny_batch(rng)
    # jit the init: on this 1-core CPU image the eager init dispatches
    # thousands of individually-compiled ops (~4 min); one compiled
    # program is ~6x faster (same trick as __graft_entry__.entry)
    variables = jax.jit(
        lambda k, b: model.init(k, b, mode='predict'))(
            jax.random.PRNGKey(0), batch)
    return model, variables, batch


def test_predict_shapes(model_and_vars):
    model, variables, batch = model_and_vars
    out = jax.jit(lambda v, b: model.apply(v, b, mode='predict'))(
        variables, batch)
    assert out['bboxes_3d'].shape == (2, 16, 9)
    assert out['scores_3d'].shape == (2, 16)
    s = np.asarray(out['scores_3d'])
    assert np.all((s >= 0) & (s <= 1))
    assert np.all(np.isfinite(np.asarray(out['bboxes_3d'])))
    # predicted sizes are positive (exp-coded)
    assert np.all(np.asarray(out['bboxes_3d'])[..., 3:6] > 0)


def test_loss_finite_and_grad(model_and_vars):
    model, variables, batch = model_and_vars

    def total(params):
        l = model.apply({'params': params,
                         'batch_stats': variables['batch_stats']},
                        batch, mode='loss', train=False)
        return sum(jax.tree_util.tree_leaves(l)), l

    # ONE compiled program for losses + grads (the eager version
    # dispatched each op separately: ~13 min on this 1-core image)
    (_, losses), g = jax.jit(
        jax.value_and_grad(total, has_aux=True))(variables['params'])
    # per-layer cls+bbox losses for 2 decoder layers
    assert set(losses) == {'loss_cls', 'loss_bbox', 'd0.loss_cls',
                           'd0.loss_bbox'}
    for k, v in losses.items():
        assert np.isfinite(float(v)), k
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.all(np.isfinite(np.asarray(x))) for x in leaves)
    # text encoder is frozen (stop_gradient)
    tg = jax.tree_util.tree_leaves(g['text_encoder'])
    assert all(np.all(np.asarray(x) == 0) for x in tg)
    # the reg head's output layer must receive gradient (its kernel is
    # zero-init per the reference, so earlier fcs are 0 at init — that's
    # expected)
    assert float(jnp.abs(
        g['bbox_head']['reg_branch']['out']['kernel']).sum()) > 0
    # the preshape must receive gradient (end-to-end differentiability
    # through voxel xyz features)
    assert float(jnp.abs(
        g['preshape']['img_trans']['kernel']).sum()) > 0


@pytest.mark.slow
def test_train_mode_runs(model_and_vars):
    model, variables, batch = model_and_vars
    out, mutated = jax.jit(lambda v, b: model.apply(
        v, b, mode='loss', train=True,
        mutable=['batch_stats'],
        rngs={'dropout': jax.random.PRNGKey(2)}))(variables, batch)
    assert 'batch_stats' in mutated
    for k, v in out.items():
        assert np.isfinite(float(v)), k
