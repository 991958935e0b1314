import numpy as np
import jax
import jax.numpy as jnp
import pytest

from proxytransformation_tpu.models.embodied_det3d import Embodied3DDetector
from proxytransformation_tpu.models.fcaf3d_head import (
    get_face_distances, get_centerness, multiclass_nms_host)
from proxytransformation_tpu.models.occ import (
    EmbodiedOccPredictor, DenseFusionOccPredictor,
    occ_multiscale_supervision)
from proxytransformation_tpu.models.det_losses import (
    rotated_iou_3d_loss, axis_aligned_iou_loss)
from proxytransformation_tpu.ops.voxelize import dynamic_scatter_3d


def test_face_distances_and_centerness():
    # axis-aligned unit box at origin
    boxes = jnp.asarray(np.tile(
        np.array([0, 0, 0, 2, 2, 2, 0, 0, 0], np.float32), (3, 1, 1)))
    pts = jnp.asarray(np.array([[[0, 0, 0]], [[0.5, 0, 0]],
                                [[2, 0, 0]]], np.float32))
    fd = np.asarray(get_face_distances(pts, boxes))
    # center: all distances 1
    np.testing.assert_allclose(fd[0, 0], [1, 1, 1, 1, 1, 1], atol=1e-5)
    # off-center in x: (1.5, 0.5, 1, 1, 1, 1)
    np.testing.assert_allclose(fd[1, 0], [1.5, 0.5, 1, 1, 1, 1], atol=1e-5)
    # outside: some negative
    assert fd[2, 0].min() < 0
    c = np.asarray(get_centerness(jnp.asarray(fd)))
    np.testing.assert_allclose(c[0, 0], 1.0, atol=1e-5)
    assert c[1, 0] < 1.0


def test_rotated_iou_loss_zero_for_identical():
    boxes = jnp.asarray(np.concatenate([
        np.random.RandomState(0).uniform(-1, 1, (4, 3)),
        np.random.RandomState(1).uniform(0.5, 1.5, (4, 3)),
        np.random.RandomState(2).uniform(-1, 1, (4, 3))], -1
    ).astype(np.float32))
    loss = float(rotated_iou_3d_loss(boxes, boxes, avg_factor=4.0))
    assert loss < 5e-3


def test_axis_aligned_iou_loss():
    a = jnp.asarray([[0, 0, 0, 2, 2, 2]], jnp.float32)
    b = jnp.asarray([[1, 1, 1, 3, 3, 3]], jnp.float32)
    loss = float(axis_aligned_iou_loss(a, b, avg_factor=1.0))
    np.testing.assert_allclose(loss, 1 - 1.0 / 15.0, atol=1e-5)


def _det_batch(rng, B=2, V=2, H=64, W=64, N=1024, G=3, C=5):
    proj = np.tile(np.array([[50, 0, W / 2, 0], [0, 50, H / 2, 0],
                             [0, 0, 1, 0], [0, 0, 0, 1]], np.float32),
                   (B, V, 1, 1))
    gt = np.concatenate([
        rng.uniform(0.5, 2.5, (B, G, 3)), rng.uniform(0.3, 1.0, (B, G, 3)),
        rng.uniform(-0.5, 0.5, (B, G, 3))], -1).astype(np.float32)
    return {
        'imgs': jnp.asarray(rng.randn(B, V, H, W, 3).astype(np.float32)),
        'points': jnp.asarray(
            rng.uniform(0, 3.0, (B, N, 3)).astype(np.float32)),
        'points_mask': jnp.ones((B, N), bool),
        'proj_mats': jnp.asarray(proj),
        'views_mask': jnp.ones((B, V), bool),
        'gt_bboxes': jnp.asarray(gt),
        'gt_labels': jnp.asarray(rng.randint(0, C, (B, G)), jnp.int32),
        'gt_masks': jnp.ones((B, G), bool),
    }


def test_detection_model_loss_and_predict():
    rng = np.random.RandomState(0)
    model = Embodied3DDetector(
        voxel_size=0.05, n_points=1024, num_classes=5,
        img_base_channels=4, backbone3d_depth=14,
        sparse_capacities=(1024, 800, 512, 256, 128, 64),
        voxel_extent=(128, 128, 128), head_out_channels=32,
        pts_prune_threshold=64)
    batch = _det_batch(rng)
    # jitted init/loss/predict: single compiled programs instead of
    # per-op eager compiles (~3x faster on this 1-core CPU image)
    variables = jax.jit(
        lambda k, b: model.init(k, b, mode='loss', train=False))(
            jax.random.PRNGKey(0), batch)
    losses = jax.jit(
        lambda v, b: model.apply(v, b, mode='loss', train=False))(
            variables, batch)
    assert set(losses) == {'loss_center', 'loss_bbox', 'loss_cls'}
    for k, v in losses.items():
        assert np.isfinite(float(v)), k
    out = jax.jit(lambda v, b: model.apply(v, b, mode='predict'))(
        variables, batch)
    boxes = np.asarray(out['bboxes_3d'])
    scores = np.asarray(out['scores_3d'])
    mask = np.asarray(out['mask'])
    assert boxes.shape[-1] == 9 and scores.shape[-1] == 5
    # host-side multiclass NMS runs
    b, s, l = multiclass_nms_host(boxes[0], scores[0], mask[0],
                                  score_thr=0.0, nms_pre=50)
    assert len(b) == len(s) == len(l)


def test_occ_supervision_and_model():
    rng = np.random.RandomState(1)
    gt_occ = jnp.asarray(np.array([[1, 2, 3, 4], [0, 0, 0, 2],
                                   [7, 7, 7, 1]], np.float32))
    mask = jnp.ones((3, ), bool)
    dense = np.asarray(occ_multiscale_supervision(gt_occ, mask, 1,
                                                  (8, 8, 8)))
    assert dense[1, 2, 3] == 4 and dense[0, 0, 0] == 2 and dense[7, 7, 7] == 1
    assert dense.sum() == 7
    d2 = np.asarray(occ_multiscale_supervision(gt_occ, mask, 2, (4, 4, 4)))
    assert d2[0, 1, 1] == 4 and d2[0, 0, 0] == 2

    model = DenseFusionOccPredictor(
        n_voxels=(16, 16, 8), voxel_range=(0, 0, 0, 3.2, 3.2, 1.6),
        num_classes=6, img_base_channels=4, neck_channels=16)
    B, V, H, W, N = 2, 2, 64, 64, 512
    proj = np.tile(np.array([[50, 0, W / 2, 0], [0, 50, H / 2, 0],
                             [0, 0, 1, 0], [0, 0, 0, 1]], np.float32),
                   (B, V, 1, 1))
    occ_pts = np.concatenate([
        rng.randint(0, 16, (B, 20, 2)), rng.randint(0, 8, (B, 20, 1)),
        rng.randint(1, 6, (B, 20, 1))], -1).astype(np.float32)
    batch = {
        'imgs': jnp.asarray(rng.randn(B, V, H, W, 3).astype(np.float32)),
        'points': jnp.asarray(
            rng.uniform(0, 3.0, (B, N, 3)).astype(np.float32)),
        'points_mask': jnp.ones((B, N), bool),
        'proj_mats': jnp.asarray(proj),
        'views_mask': jnp.ones((B, V), bool),
        'gt_occupancy': jnp.asarray(occ_pts),
        'gt_occupancy_masks': jnp.ones((B, 20), bool),
    }
    variables = jax.jit(
        lambda k, b: model.init(k, b, mode='loss', train=False))(
            jax.random.PRNGKey(0), batch)
    losses = jax.jit(
        lambda v, b: model.apply(v, b, mode='loss', train=False))(
            variables, batch)
    assert all(np.isfinite(float(v)) for v in losses.values())
    out = jax.jit(lambda v, b: model.apply(v, b, mode='predict'))(
        variables, batch)
    assert out['occupancy'].shape == (B, 16, 16, 8)


def test_dynamic_scatter_mean():
    pts = jnp.asarray([[0.5, 0.5, 0.5], [0.6, 0.5, 0.5], [2.5, 2.5, 0.5]],
                      jnp.float32)[None][0]
    feats = jnp.asarray([[1.0], [3.0], [5.0]])
    mask = jnp.ones((3, ), bool)
    grid, cnt = dynamic_scatter_3d(pts, feats, mask,
                                   jnp.asarray([0, 0, 0, 4, 4, 4.0]),
                                   (4, 4, 4))
    np.testing.assert_allclose(np.asarray(grid)[0, 0, 0], [2.0])  # mean
    np.testing.assert_allclose(np.asarray(grid)[2, 2, 0], [5.0])
    assert float(cnt.sum()) == 3
