"""Round-2 regression tests: JV assignment, aligned IoU, multi-host
gather, TTA plumbing, preprocessor contracts, FPS random start."""
import warnings

import numpy as np
import pytest
import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# Jonker-Volgenant device assignment (>14 gts)
# ---------------------------------------------------------------------------
def test_jv_matches_scipy_large_g():
    from proxytransformation_tpu.ops.hungarian import (hungarian_assign,
                                                       _lsa_host)
    rng = np.random.RandomState(3)
    B, Q, G = 4, 48, 22  # > 14 → auto-dispatches to JV
    cost = rng.randn(B, Q, G).astype(np.float32) * 10
    num_g = np.array([22, 0, 7, 15], np.int32)
    out = np.asarray(hungarian_assign(jnp.asarray(cost),
                                      jnp.asarray(num_g)))
    ref = _lsa_host(cost, num_g)
    for b in range(B):
        assert (out[b] >= 0).sum() == num_g[b]
        picked = out[b][out[b] >= 0]
        assert len(set(picked.tolist())) == len(picked)
        c_out = sum(cost[b, q, out[b, q]] for q in range(Q)
                    if out[b, q] >= 0)
        c_ref = sum(cost[b, q, ref[b, q]] for q in range(Q)
                    if ref[b, q] >= 0)
        assert abs(c_out - c_ref) < 1e-3


def test_jv_agrees_with_dp_small_g():
    from proxytransformation_tpu.ops.hungarian import (hungarian_assign_dp,
                                                       hungarian_assign_jv)
    rng = np.random.RandomState(4)
    cost = rng.randn(3, 20, 6).astype(np.float32)
    num_g = np.array([6, 3, 1], np.int32)
    dp = np.asarray(hungarian_assign_dp(jnp.asarray(cost),
                                        jnp.asarray(num_g)))
    jv = np.asarray(hungarian_assign_jv(jnp.asarray(cost),
                                        jnp.asarray(num_g)))
    for b in range(3):
        c_dp = sum(cost[b, q, dp[b, q]] for q in range(20) if dp[b, q] >= 0)
        c_jv = sum(cost[b, q, jv[b, q]] for q in range(20) if jv[b, q] >= 0)
        assert abs(c_dp - c_jv) < 1e-4


# ---------------------------------------------------------------------------
# aligned (elementwise) exact IoU
# ---------------------------------------------------------------------------
def test_box3d_iou_aligned_matches_pairwise_diag():
    from proxytransformation_tpu.ops.box3d_overlap import (box3d_iou,
                                                           box3d_iou_aligned)
    rng = np.random.RandomState(5)
    n = 6
    boxes1 = np.concatenate([rng.uniform(-1, 1, (n, 3)),
                             rng.uniform(0.5, 2, (n, 3)),
                             rng.uniform(-0.5, 0.5, (n, 3))],
                            -1).astype(np.float32)
    boxes2 = boxes1 + rng.uniform(-0.2, 0.2, (n, 9)).astype(np.float32)
    full = np.asarray(box3d_iou(jnp.asarray(boxes1), jnp.asarray(boxes2)))
    aligned = np.asarray(box3d_iou_aligned(jnp.asarray(boxes1),
                                           jnp.asarray(boxes2)))
    np.testing.assert_allclose(aligned, np.diag(full), atol=1e-4)
    # broadcasting form used by the matcher: (B, Q, 1) × (B, 1, G)
    b1 = jnp.asarray(boxes1).reshape(2, 3, 1, 9)
    b2 = jnp.asarray(boxes2).reshape(2, 1, 3, 9)
    grid = np.asarray(box3d_iou_aligned(b1, b2))
    assert grid.shape == (2, 3, 3)
    for s in range(2):
        blk = np.asarray(box3d_iou(jnp.asarray(boxes1[3 * s:3 * s + 3]),
                                   jnp.asarray(boxes2[3 * s:3 * s + 3])))
        np.testing.assert_allclose(grid[s], blk, atol=1e-4)


# ---------------------------------------------------------------------------
# multi-host gather (single-host no-op + pack/unpack round trip)
# ---------------------------------------------------------------------------
def test_allgather_objects_single_host():
    from proxytransformation_tpu.parallel import (allgather_objects,
                                                  pack_objects,
                                                  unpack_objects)
    objs = [{'a': np.arange(3), 'flag': True}, {'b': 'text'}]
    out = allgather_objects(objs)
    assert len(out) == 2 and out[1]['b'] == 'text'
    buf = pack_objects(objs)
    padded = np.concatenate([buf, np.zeros(17, np.uint8)])
    back = unpack_objects(padded, buf.size)
    assert back[1]['b'] == 'text'
    np.testing.assert_array_equal(back[0]['a'], np.arange(3))


# ---------------------------------------------------------------------------
# TTA plumbing
# ---------------------------------------------------------------------------
def test_tta_metas_and_apply():
    from proxytransformation_tpu.engine.runner import Runner
    metas = Runner._tta_metas.__get__(
        type('R', (), {'cfg': {'tta_cfg': {'flip': True,
                                           'pts_scale_ratio': [1.0, 1.1]}}})())
    metas = metas()
    assert len(metas) == 4  # 2 scales × (no-flip, hflip)
    batch = {'points': np.ones((2, 5, 3), np.float32),
             'points_mask': np.ones((2, 5), bool)}
    aug = Runner._apply_tta_aug(batch, metas[1])  # hflip @ scale 1.0
    assert aug['points'][0, 0, 0] == -1.0
    assert aug['points'][0, 0, 1] == 1.0
    assert aug['pcd_flip_x'].all() and not aug['pcd_flip_y'].any()
    # scale variant
    aug2 = Runner._apply_tta_aug(batch, metas[2])  # scale 1.1 no flip
    np.testing.assert_allclose(aug2['points'][..., :3], 1.1, atol=1e-6)


def test_tta_merge_improves_on_flipped_prediction():
    """A prediction made in the flipped frame maps back onto the gt."""
    from proxytransformation_tpu.models.tta import merge_aug_bboxes_3d
    gt = np.array([[1.0, 2.0, 0.5, 1.0, 1.0, 1.0, 0.0, 0.0, 0.0]])
    flipped_pred = gt.copy()
    flipped_pred[0, 0] *= -1  # the model predicted in the x-flipped frame
    merged = merge_aug_bboxes_3d(
        [{'bboxes_3d': np.zeros((1, 9)), 'scores_3d': np.array([0.1])},
         {'bboxes_3d': flipped_pred, 'scores_3d': np.array([0.9])}],
        [{'pcd_horizontal_flip': False, 'pcd_vertical_flip': False},
         {'pcd_horizontal_flip': True, 'pcd_vertical_flip': False}])
    np.testing.assert_allclose(merged['bboxes_3d'][0, :3], gt[0, :3],
                               atol=1e-5)
    assert merged['scores_3d'][0] == 0.9


# ---------------------------------------------------------------------------
# preprocessor contracts
# ---------------------------------------------------------------------------
def _mini_sample(n_boxes=1, point_channels=3):
    rng = np.random.RandomState(0)
    return {
        'imgs': rng.randint(0, 255, (1, 32, 32, 3)).astype(np.float32),
        'points': rng.randn(50, point_channels).astype(np.float32),
        'text': 'the red chair',
        'gt_bboxes_3d': np.tile(
            np.array([[0, 0, 0, 1, 1, 1, 0, 0, 0]], np.float32),
            (n_boxes, 1)),
    }


def test_preprocessor_warns_on_gt_truncation():
    from proxytransformation_tpu.data.preprocessor import (
        Det3DDataPreprocessor)
    pp = Det3DDataPreprocessor(n_points=64, n_views=1, max_gts=2)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter('always')
        batch = pp([_mini_sample(n_boxes=5)])
    assert any('max_gts' in str(x.message) for x in w)
    assert batch['gt_bboxes'].shape[1] == 2


def test_preprocessor_keeps_color_channels():
    from proxytransformation_tpu.data.preprocessor import (
        Det3DDataPreprocessor)
    pp = Det3DDataPreprocessor(n_points=64, n_views=1, point_channels=6)
    batch = pp([_mini_sample(point_channels=6)])
    assert batch['points'].shape[-1] == 6
    # channel count is a fixed config (ADVICE r2): a 3-channel sample in
    # the same config zero-pads instead of changing the batch shape
    batch3 = pp([_mini_sample(point_channels=3)])
    assert batch3['points'].shape[-1] == 6
    assert np.allclose(batch3['points'][..., 3:], 0.0)
    # and channels beyond the config are truncated
    pp3 = Det3DDataPreprocessor(n_points=64, n_views=1)
    assert pp3([_mini_sample(point_channels=6)])['points'].shape[-1] == 3


def test_use_xyz_feat_false_raises_cleanly_without_colors():
    from proxytransformation_tpu.models.detector import (
        SparseFeatureFusion3DGrounderPreshape)
    model = SparseFeatureFusion3DGrounderPreshape(
        num_queries=4, n_points=128, use_xyz_feat=False, use_preshape=False,
        img_base_channels=4, text_width=32, text_layers=1, text_heads=2,
        grid_size=2, text_blocks=1, img_blocks=1, backbone3d_depth=18,
        sparse_capacities=(128, 64, 32, 16, 8, 4), voxel_extent=(32, 32, 32),
        neck_out_channels=16, pts_prune_threshold=8, decoder_layers=1,
        embed_dims=16, num_heads=2, ffn_channels=32, img_spacial_dim=2,
        max_text_len=16)
    rng = np.random.RandomState(0)
    batch = {
        'imgs': jnp.asarray(rng.randn(1, 1, 32, 32, 3), jnp.float32),
        'points': jnp.asarray(rng.uniform(0, 1, (1, 128, 3)), jnp.float32),
        'points_mask': jnp.ones((1, 128), bool),
        'input_ids': jnp.zeros((1, 4), jnp.int32),
        'text_mask': jnp.ones((1, 4), bool),
        'proj_mats': jnp.tile(jnp.eye(4), (1, 1, 1, 1)),
        'views_mask': jnp.ones((1, 1), bool),
    }
    with pytest.raises(ValueError, match='use_xyz_feat'):
        # under jit the ValueError fires at TRACE time — no per-op
        # eager compiles (this test spent 76 s dispatching the R50
        # stem eagerly just to reach the raise)
        jax.jit(lambda k, b: model.init(k, b, mode='predict'))(
            jax.random.PRNGKey(0), batch)


# ---------------------------------------------------------------------------
# FPS random start
# ---------------------------------------------------------------------------
def test_fps_random_start_option():
    from proxytransformation_tpu.ops.fps import sample_farthest_points
    rng = np.random.RandomState(6)
    pts = jnp.asarray(rng.randn(2, 40, 3), jnp.float32)
    _, det1 = sample_farthest_points(pts, K=8)
    _, det2 = sample_farthest_points(pts, K=8)
    np.testing.assert_array_equal(np.asarray(det1), np.asarray(det2))
    assert int(det1[0, 0]) == 0  # deterministic start = first valid
    _, r1 = sample_farthest_points(pts, K=8, rng=jax.random.PRNGKey(0))
    _, r2 = sample_farthest_points(pts, K=8, rng=jax.random.PRNGKey(3))
    assert not np.array_equal(np.asarray(r1), np.asarray(r2))
    # still a valid sample of distinct indices
    for b in range(2):
        assert len(set(np.asarray(r1[b]).tolist())) == 8


def test_val_batch_padding():
    from proxytransformation_tpu.engine.runner import Runner
    batch = {'points': np.random.randn(3, 10, 3).astype(np.float32),
             'points_mask': np.ones((3, 10), bool),
             'eval_ann_info': [1, 2, 3]}
    padded, real = Runner._pad_batch(batch, 4)
    assert real == 3
    assert padded['points'].shape[0] == 4
    np.testing.assert_array_equal(padded['points'][3], padded['points'][2])
    assert len(padded['eval_ann_info']) == 3  # host lists untouched


# ---------------------------------------------------------------------------
# numpy frustum/surface utilities
# ---------------------------------------------------------------------------
def test_box_np_ops_frustum_tail():
    from proxytransformation_tpu.structures import box_np_ops as ops
    rng = np.random.RandomState(0)

    # surfaces + 3D polygon containment: unit cube at origin
    corners = ops.center_to_corner_box3d(
        np.zeros((1, 3)), np.ones((1, 3)), np.zeros((1, )))
    surfaces = ops.corner_to_surfaces_3d(corners)
    pts = np.array([[0.0, 0.0, 0.0], [0.4, 0.4, 0.4], [0.6, 0.0, 0.0]])
    inside = ops.points_in_convex_polygon_3d(pts, surfaces)
    assert inside[0, 0] and inside[1, 0] and not inside[2, 0]

    # standup of rotated corners bounds the corners
    c2 = ops.center_to_corner_box3d(
        rng.randn(4, 3), np.abs(rng.randn(4, 3)) + 0.5, rng.randn(4))
    standup = ops.corner_to_standup_nd(c2)
    assert np.all(standup[:, :3] <= standup[:, 3:])

    # camera↔lidar round trip
    r_rect = np.eye(4)
    velo2cam = np.eye(4)
    velo2cam[:3, 3] = [0.1, -0.2, 0.3]
    p = rng.randn(10, 3)
    cam = np.concatenate([p, np.ones((10, 1))], 1) @ (r_rect @ velo2cam).T
    back = ops.camera_to_lidar(cam[:, :3], r_rect, velo2cam)
    np.testing.assert_allclose(back, p, atol=1e-6)

    # projection decomposition: P = C[R|T] reconstructs
    C = np.array([[500.0, 0, 320], [0, 500, 240], [0, 0, 1]])
    th = 0.3
    R = np.array([[np.cos(th), -np.sin(th), 0],
                  [np.sin(th), np.cos(th), 0], [0, 0, 1.0]])
    T = np.array([0.2, -0.1, 0.5])
    P = C @ np.concatenate([R, T[:, None]], 1)
    C2, R2, T2 = ops.projection_matrix_to_CRT_kitti(P)
    np.testing.assert_allclose(C2, C, atol=1e-6)
    np.testing.assert_allclose(R2, R, atol=1e-6)
    np.testing.assert_allclose(T2, T, atol=1e-6)

    # frustum corners have near/far depths
    fr = ops.get_frustum([0, 0, 640, 480], C, 0.01, 10.0)
    assert fr.shape == (8, 3)
    np.testing.assert_allclose(fr[:4, 2], 0.01)
    np.testing.assert_allclose(fr[4:, 2], 10.0)

    # remove_outside_points keeps points in front of the camera
    pts3 = np.array([[5.0, 0.0, 0.0], [-5.0, 0.0, 0.0]])
    kept = ops.remove_outside_points(
        pts3, np.eye(4), np.eye(4),
        C @ np.concatenate(
            [np.array([[0, -1, 0], [0, 0, -1], [1, 0, 0.0]]),
             np.zeros((3, 1))], 1),
        (480, 640))
    assert len(kept) == 1 and kept[0, 0] == 5.0

    # depth map → points
    depth = np.zeros((4, 5), np.float32)
    depth[1, 2] = 2.5
    out = ops.depth_to_points(depth)
    np.testing.assert_allclose(out, [[2, 1, 2.5]])

    # box3d_to_bbox projects within image for a centered box
    P4 = np.eye(4)
    P4[:3, :4] = C @ np.concatenate(
        [np.array([[0, -1, 0], [0, 0, -1], [1, 0, 0.0]]),
         np.zeros((3, 1))], 1)
    bb = ops.box3d_to_bbox(np.array([[4.0, 0, 0, 1, 1, 1, 0.2]]), P4)
    assert bb.shape == (1, 4) and bb[0, 0] < bb[0, 2]

    # rbbox2d_to_near_bbox swaps dims near ±π/2
    rb = np.array([[0, 0, 2.0, 1.0, 0.0], [0, 0, 2.0, 1.0, np.pi / 2]])
    near = ops.rbbox2d_to_near_bbox(rb)
    np.testing.assert_allclose(near[0], [-1, -0.5, 1, 0.5])
    np.testing.assert_allclose(near[1], [-0.5, -1, 0.5, 1])


def test_bbox3d_result_transforms():
    from proxytransformation_tpu.structures import (bbox3d_mapping_back,
                                                    bbox3d2roi,
                                                    bbox3d2result)
    box = np.array([[1.0, 2.0, 0.5, 2.0, 1.0, 1.0, 0.3, 0.0, 0.0]])
    back = bbox3d_mapping_back(box, scale_factor=2.0,
                               flip_horizontal=True, flip_vertical=False)
    np.testing.assert_allclose(back[0, 0], -0.5, atol=1e-6)  # -1/2
    np.testing.assert_allclose(back[0, 3], 1.0, atol=1e-6)   # 2/2

    rois = bbox3d2roi([box, np.zeros((2, 9))])
    assert rois.shape == (3, 10)
    assert rois[0, 0] == 0 and rois[1, 0] == 1

    res = bbox3d2result(np.zeros((2, 9)), np.ones(2), np.zeros(2, np.int64))
    assert set(res) == {'bboxes_3d', 'scores_3d', 'labels_3d'}


def test_ema_train_step_hook():
    """Opt-in ExpMomentumEMA advances the weight average inside the
    jitted train step (reference models/layers/ema.py:123-189)."""
    import flax.linen as nn
    import jax
    import math
    from proxytransformation_tpu.engine.train import (
        build_optimizer, create_train_state, make_train_step)
    from proxytransformation_tpu.models.misc import ExpMomentumEMA

    class Toy(nn.Module):
        @nn.compact
        def __call__(self, batch, mode='loss', train=False):
            y = nn.Dense(1, name='fc')(batch['x'])
            self.variable('batch_stats', 'dummy', lambda: jnp.zeros(()))
            return {'loss': jnp.mean(jnp.square(y))}

    model = Toy()
    batch = {'x': jnp.ones((2, 3))}
    variables = model.init(jax.random.PRNGKey(0), batch)
    tx = build_optimizer(variables['params'])
    ema = ExpMomentumEMA(momentum=0.1, gamma=5)
    state = create_train_state(model, variables, tx, with_ema=True)
    assert state.ema_params is not None
    step_fn = jax.jit(make_train_step(model, tx, ema=ema))
    rng = jax.random.PRNGKey(1)

    p0 = state.params['fc']['kernel']
    state1, _ = step_fn(state, batch, rng)
    m0 = (1 - 0.1) * math.exp(-1 / 5) + 0.1
    expect = (1 - m0) * p0 + m0 * state1.params['fc']['kernel']
    np.testing.assert_allclose(np.asarray(state1.ema_params['fc']['kernel']),
                               np.asarray(expect), rtol=1e-5)
    # without the hook, ema stays None
    state_off = create_train_state(model, variables, tx)
    step_off = jax.jit(make_train_step(model, tx))
    s2, _ = step_off(state_off, batch, rng)
    assert s2.ema_params is None


def test_runner_ema_config_detection():
    from proxytransformation_tpu.engine.runner import Runner
    r = Runner.__new__(Runner)
    r.cfg = {'custom_hooks': [
        {'type': 'EMAHook', 'ema_type': 'ExpMomentumEMA',
         'momentum': 0.001, 'gamma': 100}]}
    ema = r._ema()
    assert ema is not None and ema.momentum == 0.001 and ema.gamma == 100
    r.cfg = {'custom_hooks': []}
    assert r._ema() is None
    r.cfg = {}
    assert r._ema() is None


def test_tta_batch_stacking():
    """Batched-aug TTA: the stacked batch holds each aug's arrays in
    order along the batch dim; host lists stay unstacked."""
    import numpy as np
    from proxytransformation_tpu.engine.runner import Runner
    metas = Runner._tta_metas.__get__(
        type('R', (), {'cfg': {'tta_cfg': {'flip': True,
                                           'pts_scale_ratio': [1.0, 1.1]}}})
        ())()
    B, N = 2, 16
    rng = np.random.RandomState(0)
    batch = {
        'points': rng.randn(B, N, 3).astype(np.float32),
        'points_mask': np.ones((B, N), bool),
        'eval_ann_info': [{'idx': 0}, {'idx': 1}],
    }
    cat = Runner._stack_tta_batches(batch, metas)
    A = len(metas)
    assert cat['points'].shape == (A * B, N, 3)
    assert cat['pcd_flip_x'].shape == (A * B, )
    assert cat['eval_ann_info'] == batch['eval_ann_info']  # unstacked
    for i, m in enumerate(metas):
        aug = Runner._apply_tta_aug(batch, m)
        np.testing.assert_array_equal(cat['points'][i * B:(i + 1) * B],
                                      aug['points'])
        np.testing.assert_array_equal(cat['pcd_flip_x'][i * B:(i + 1) * B],
                                      aug['pcd_flip_x'])
