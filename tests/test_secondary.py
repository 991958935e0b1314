import io
import json
import os
import struct
import sys
import zlib

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, 'tools'))


def test_visualizer_matplotlib_render(tmp_path):
    from proxytransformation_tpu.visualization import (
        EmbodiedScanBaseVisualizer)
    rng = np.random.RandomState(0)
    viz = EmbodiedScanBaseVisualizer(['chair', 'table'],
                                     save_dir=str(tmp_path))
    pts = rng.uniform(0, 4, (2000, 3)).astype(np.float32)
    boxes = np.array([[1, 1, 1, 0.5, 0.5, 0.5, 0.3, 0, 0],
                      [3, 3, 1, 0.8, 0.4, 0.6, 0, 0, 0]], np.float32)
    out = viz.visualize_scene(pts, boxes, np.array([0, 1]),
                              np.array([0.9, 0.8]), name='t')
    assert os.path.exists(out) and out.endswith('.png')
    ply = viz.export_ply(pts, 'pc')
    assert open(ply).readline().strip() == 'ply'


def test_img_drawer(tmp_path):
    from proxytransformation_tpu.visualization import ImgDrawer
    drawer = ImgDrawer(['chair'])
    img = np.zeros((100, 100, 3), np.uint8)
    proj = np.array([[50, 0, 50, 0], [0, 50, 50, 0], [0, 0, 1, 0],
                     [0, 0, 0, 1]], np.float32)
    boxes = np.array([[0, 0, 2, 0.5, 0.5, 0.5, 0, 0, 0]], np.float32)
    out = drawer.draw_boxes(img, boxes, proj, np.array([0]))
    assert out.sum() > 0  # something was drawn


def _write_fake_sens(path, n_frames=3):
    import cv2
    with open(path, 'wb') as f:
        f.write(struct.pack('I', 4))
        name = b'fake'
        f.write(struct.pack('Q', len(name)))
        f.write(name)
        for _ in range(4):
            f.write(struct.pack('f' * 16, *np.eye(4).ravel()))
        f.write(struct.pack('i', 2))  # jpeg
        f.write(struct.pack('i', 1))  # zlib_ushort
        f.write(struct.pack('I', 8))   # color w
        f.write(struct.pack('I', 6))   # color h
        f.write(struct.pack('I', 8))   # depth w
        f.write(struct.pack('I', 6))   # depth h
        f.write(struct.pack('f', 1000.0))
        f.write(struct.pack('Q', n_frames))
        rng = np.random.RandomState(0)
        for i in range(n_frames):
            pose = np.eye(4, dtype=np.float32)
            pose[0, 3] = i
            f.write(struct.pack('f' * 16, *pose.ravel()))
            f.write(struct.pack('Q', i))
            f.write(struct.pack('Q', i))
            img = rng.randint(0, 255, (6, 8, 3), np.uint8)
            ok, jpg = cv2.imencode('.jpg', img)
            depth = (rng.randint(0, 5000, (6, 8))).astype(np.uint16)
            dz = zlib.compress(depth.tobytes())
            f.write(struct.pack('Q', len(jpg.tobytes())))
            f.write(struct.pack('Q', len(dz)))
            f.write(jpg.tobytes())
            f.write(dz)
    return path


def test_sens_reader_roundtrip(tmp_path):
    from proxytransformation_tpu.converter import (SensReader,
                                                   extract_scannet_images)
    path = _write_fake_sens(str(tmp_path / 'scene.sens'))
    reader = SensReader(path)
    assert reader.num_frames == 3
    assert reader.depth_shift == 1000.0
    frames = list(reader.frames())
    assert len(frames) == 3
    pose, jpg, depth = frames[2]
    assert pose[0, 3] == 2.0
    assert depth.shape == (6, 8)
    n = extract_scannet_images(path, str(tmp_path / 'out'))
    assert n == 3
    assert os.path.exists(tmp_path / 'out' / 'depth' / '000002.png')


def test_occupancy_ann_extractor():
    from proxytransformation_tpu.converter import (
        extract_occupancy_annotations)
    pts = np.array([[0.1, 0.1, 0.1], [0.15, 0.12, 0.11], [1.5, 1.5, 0.5]])
    labels = np.array([3, 3, 7])
    occ = extract_occupancy_annotations(pts, labels, (0, 0, 0, 2, 2, 1),
                                        (4, 4, 2))
    occ = {tuple(r[:3]): r[3] for r in occ}
    assert occ[(0, 0, 0)] == 3
    assert occ[(3, 3, 1)] == 7


def test_explorer(tmp_path):
    import pickle
    from proxytransformation_tpu.explorer import EmbodiedScanExplorer
    ann = {'metainfo': {'categories': {'chair': 0, 'table': 1}},
           'data_list': [{
               'sample_idx': 'scannet/scene0000_00',
               'images': [{}, {}],
               'instances': [{'bbox_3d': [0] * 9, 'bbox_label_3d': 0},
                             {'bbox_3d': [1] * 9, 'bbox_label_3d': 0}],
           }]}
    p = tmp_path / 'infos.pkl'
    with open(p, 'wb') as f:
        pickle.dump(ann, f)
    ex = EmbodiedScanExplorer(ann_files=[str(p)], save_dir=str(tmp_path))
    assert ex.count_scenes() == 1
    info = ex.scene_info('scannet/scene0000_00')
    assert info['num_instances'] == 2 and info['categories'] == {'chair': 2}
    assert ex.category_statistics() == {'chair': 2}
    pts = np.random.RandomState(0).rand(500, 3).astype(np.float32)
    out = ex.render_scene('scannet/scene0000_00', pts)
    assert out and os.path.exists(out)


def test_portable_scorer_matches_framework_metric(tmp_path):
    """The numpy-only portable scorer is an independent oracle for the
    in-framework metric (reference SURVEY §4.2)."""
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        'portable', os.path.join(REPO, 'tools/eval_script_portable.py'))
    portable = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(portable)
    from proxytransformation_tpu.eval.grounding_metric import ground_eval

    rng = np.random.RandomState(3)
    det, gt = [], []
    for i in range(6):
        boxes = np.concatenate([
            rng.uniform(-1, 1, (12, 3)), rng.uniform(0.4, 1.2, (12, 3)),
            rng.uniform(-1, 1, (12, 3))], -1).astype(np.float32)
        scores = rng.rand(12).astype(np.float32)
        gtb = boxes[rng.randint(12)][None] + \
            rng.uniform(-0.05, 0.05, (1, 9)).astype(np.float32)
        det.append({'bboxes_3d': boxes, 'target_scores_3d': scores})
        gt.append({'gt_bboxes_3d': gtb, 'is_hard': bool(i % 2),
                   'is_view_dep': bool(i % 3 == 0), 'is_unique': False})
    ours = ground_eval(gt, det, top_k=5)
    ref = portable.ground_eval(gt, det, top_k=5)
    for k in ref:
        np.testing.assert_allclose(ours[k], ref[k], atol=1e-6, err_msg=k)


def test_misc_components():
    import jax
    import jax.numpy as jnp
    from proxytransformation_tpu.models.misc import (
        ExpMomentumEMA, Anchor3DRangeGenerator, get_sine_pos_embed,
        focal_loss_cost, token_map_cost)
    ema = ExpMomentumEMA()
    p = {'w': jnp.ones(3)}
    e = {'w': jnp.zeros(3)}
    # early steps: the exponentially-ramped momentum is ~1, so the EMA
    # snaps to the source params (mmdet ExpMomentumEMA warmup behavior)
    e2 = ema.update(e, p, step=0)
    assert float(e2['w'][0]) > 0.99
    # late steps: momentum decays to ~2e-4, EMA barely moves
    e3 = ema.update(e, p, step=100000)
    assert float(e3['w'][0]) < 1e-3
    gen = Anchor3DRangeGenerator(ranges=[[0, 0, 0, 4, 4, 2]],
                                 sizes=[[1, 1, 1]], rotations=[0.0])
    anchors = gen.grid_anchors((2, 2, 1))[0]
    assert anchors.shape == (4, 7)
    emb = get_sine_pos_embed(jnp.ones((2, 3)), num_feats=8)
    assert emb.shape == (2, 24)
    c = focal_loss_cost(jnp.zeros((4, 5)), jnp.asarray([1, 2]))
    assert c.shape == (4, 2)
    t = token_map_cost(jnp.ones((4, 6)), jnp.ones((2, 6)))
    assert t.shape == (4, 2)


def test_tta_merge():
    from proxytransformation_tpu.models.tta import merge_aug_bboxes_3d
    base = np.array([[1, 1, 1, 2, 2, 2, 0.3, 0, 0]], np.float32)
    flipped = base.copy()
    flipped[:, 0] *= -1
    flipped[:, 6] = -flipped[:, 6] + np.pi
    res = merge_aug_bboxes_3d(
        [{'bboxes_3d': base, 'scores_3d': np.array([0.9])},
         {'bboxes_3d': flipped, 'scores_3d': np.array([0.8])}],
        [{}, {'pcd_horizontal_flip': True}])
    assert res['bboxes_3d'].shape == (2, 9)
    # the un-flipped second box must match the first (same corners)
    from proxytransformation_tpu.structures import box_corners
    import jax.numpy as jnp
    c1 = np.sort(np.asarray(box_corners(jnp.asarray(res['bboxes_3d'][:1]))),
                 axis=1)
    c2 = np.sort(np.asarray(box_corners(jnp.asarray(res['bboxes_3d'][1:]))),
                 axis=1)
    np.testing.assert_allclose(c1, c2, atol=1e-4)
