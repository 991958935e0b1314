"""Tooling tail: line mesh, continuous drawers, 3RScan extractor,
vis backends."""
import json
import os
import zipfile

import numpy as np


def test_line_mesh_geometry(tmp_path):
    from proxytransformation_tpu.visualization import LineMesh
    pts = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0]], np.float32)
    lm = LineMesh(pts, radius=0.05, sides=6)
    # 2 segments × (2 rings × 6 verts)
    assert lm.vertices.shape == (24, 3)
    assert lm.triangles.shape == (24, 3)
    assert lm.vertex_colors.shape == (24, 3)
    # all vertices lie within radius of their segment
    assert np.isfinite(lm.vertices).all()
    out = tmp_path / 'mesh.ply'
    lm.save_ply(str(out))
    head = out.read_text().splitlines()
    assert head[0] == 'ply' and 'element vertex 24' in out.read_text()


def test_continuous_drawer_headless(tmp_path):
    from proxytransformation_tpu.visualization import ContinuousDrawer
    rng = np.random.RandomState(0)
    H = W = 16
    views = []
    for i in range(3):
        views.append({
            'depth': rng.randint(500, 3000, (H, W)).astype(np.float32),
            'img': rng.randint(0, 255, (H, W, 3)).astype(np.uint8),
            'intrinsic': np.array([[20, 0, W / 2, 0], [0, 20, H / 2, 0],
                                   [0, 0, 1, 0], [0, 0, 0, 1]], np.float32),
            'cam2global': np.eye(4, dtype=np.float32),
            'visible_instance_ids': [i],
        })
    boxes = np.tile(np.array([[0, 0, 1, 1, 1, 1, 0, 0, 0]], np.float32),
                    (3, 1))
    d = ContinuousDrawer(views, boxes=boxes, labels=[0, 1, 2],
                         classes=['a', 'b', 'c'], save_dir=str(tmp_path))
    s0 = d.step()
    assert s0['view_index'] == 0
    assert len(s0['boxes']) == 1  # only instance 0 seen so far
    s1 = d.step()
    assert len(s1['boxes']) == 2
    assert s1['points'].shape[0] > s0['points'].shape[0]  # accumulates
    s2 = d.step()
    assert len(s2['boxes']) == 3
    assert d.step() is None


def test_continuous_occupancy_drawer(tmp_path):
    from proxytransformation_tpu.visualization import (
        ContinuousOccupancyDrawer)
    views = [{'occupancy': np.array([[0, 0, 0, 1], [1, 0, 0, 2]])},
             {'occupancy': np.array([[0, 0, 0, 2], [2, 2, 2, 1]])}]
    d = ContinuousOccupancyDrawer(views, voxel_size=0.5,
                                  classes=['x', 'y', 'z'],
                                  save_dir=str(tmp_path))
    s0 = d.step()
    assert s0['points'].shape == (2, 6)
    s1 = d.step()
    assert s1['points'].shape == (3, 6)  # one new voxel, one overwritten
    np.testing.assert_allclose(sorted(s1['points'][:, 0])[-1],
                               0.5 * 2.5)  # center of (2,2,2)


def test_3rscan_extractor(tmp_path):
    from proxytransformation_tpu.converter import extract_3rscan_images
    scene = tmp_path / 'scene-abc'
    scene.mkdir()
    with zipfile.ZipFile(scene / 'sequence.zip', 'w') as zf:
        zf.writestr('frame-000000.color.jpg', b'xx')
        zf.writestr('frame-000000.pose.txt', '1 0 0 0')
    (tmp_path / 'scene-nozip').mkdir()  # no sequence.zip → skipped
    done = extract_3rscan_images(str(tmp_path), nproc=1)
    assert len(done) == 1
    assert os.path.exists(scene / 'sequence' / 'frame-000000.pose.txt')


def test_local_vis_backend(tmp_path):
    from proxytransformation_tpu.utils.vis_backend import (
        LocalVisBackend, WandbVisBackend, build_vis_backends)
    be = LocalVisBackend(str(tmp_path))
    be.add_scalars({'loss': 1.5}, step=10)
    be.add_scalars({'loss': 1.2}, step=20)
    recs = [json.loads(l) for l in
            (tmp_path / 'scalars.jsonl').read_text().splitlines()]
    assert recs[1]['loss'] == 1.2 and recs[1]['step'] == 20
    # wandb not installed → warns, no-ops safely
    wb = WandbVisBackend(str(tmp_path))
    wb.add_scalars({'loss': 1.0}, step=1)
    wb.close()
    backends = build_vis_backends(
        {'visualizer': {'vis_backends': [{'type': 'LocalVisBackend'}]}},
        str(tmp_path))
    assert len(backends) == 1


def test_explorer_full_surface(tmp_path):
    """Explorer listing + continuous render + show_image on the
    miniature real-data fixture."""
    import pickle
    import sys
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from test_realdata_e2e import _make_mini_dataset
    root = _make_mini_dataset(str(tmp_path / 'data'))
    # explorer expects absolute paths; the fixture writes relative ones
    with open(os.path.join(root, 'mini_infos_train.pkl'), 'rb') as f:
        infos = pickle.load(f)
    for d in infos['data_list']:
        for im in d['images']:
            im['img_path'] = os.path.join(root, im['img_path'])
            im['depth_path'] = os.path.join(root, im['depth_path'])
    fixed = tmp_path / 'infos_abs.pkl'
    with open(fixed, 'wb') as f:
        pickle.dump(infos, f)

    from proxytransformation_tpu.explorer import EmbodiedScanExplorer
    ex = EmbodiedScanExplorer(data_root=root, ann_files=[str(fixed)],
                              save_dir=str(tmp_path / 'viz'))
    assert ex.count_scenes() == 2
    cats = ex.list_categories()
    assert {'category': 'chair', 'id': 0} in cats
    scene = ex.list_scenes()[0]
    cams = ex.list_cameras(scene)
    assert len(cams) == 3
    insts = ex.list_instances(scene)
    assert len(insts) == 2 and insts[0]['name'] == 'chair'

    img = ex.show_image(scene, cams[0], render_box=True)
    assert img is not None and img.ndim == 3

    outs = ex.render_continuous_scene(scene)
    assert len(outs) == 3  # one render per view

    occ_states = ex.render_continuous_occupancy(
        [np.array([[0, 0, 0, 1]]), np.array([[1, 1, 1, 2]])])
    assert len(occ_states) == 2
    assert occ_states[1]['points'].shape[0] == 2


def test_surface_scene_generator():
    """Surface scans must hit the real-data occupancy regime: level
    occupancies within the backbone capacities (uniform scatter
    overflows them), deterministic per seed, inside the room AABB."""
    from proxytransformation_tpu.data.synthetic import (
        surface_scene_batch, surface_scene_points)
    pts = surface_scene_points(50_000, seed=3)
    assert pts.shape == (50_000, 3) and pts.dtype == np.float32
    again = surface_scene_points(50_000, seed=3)
    assert np.array_equal(pts, again)
    assert (pts.min(0) > -0.1).all() and (pts.max(0) < [11.2, 9.2, 3.2]).all()

    full = surface_scene_points(100_000, seed=0)
    q0 = np.floor((full - full.min(0)) / 0.01).astype(np.int64)
    # occupancy at the backbone's stage strides stays within the
    # actual backbone capacities (import, don't duplicate — retuned
    # capacities must keep being guarded here)
    from proxytransformation_tpu.models.sparse_resnet import MinkResNet
    for stride, cap in zip((2, 4, 8, 16), MinkResNet.capacities[:4]):
        q = q0 // stride
        n = len(np.unique((q[:, 0] * 4096 + q[:, 1]) * 4096 + q[:, 2]))
        assert n <= cap, (stride, n)
    # 2D manifold: coarsening 8x -> 16x shrinks occupancy ~4x
    n8 = len(np.unique(((q0 // 8)[:, 0] * 4096 + (q0 // 8)[:, 1]) * 4096
                       + (q0 // 8)[:, 2]))
    n16 = len(np.unique(((q0 // 16)[:, 0] * 4096 + (q0 // 16)[:, 1]) * 4096
                        + (q0 // 16)[:, 2]))
    assert 2.5 < n8 / n16 < 6.0

    b = surface_scene_batch(2, 10_000, seed=1)
    assert b.shape == (2, 10_000, 3)
    assert not np.array_equal(b[0], b[1])  # distinct scenes per sample


# ---- data loader worker paths ------------------------------------------

class _SeqDataset:
    """Tiny picklable dataset for the spawn-worker loader path."""

    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return {'i': np.int64(i), 'x': np.full((4, ), i, np.float32)}


def _seq_collate(samples):
    return {'i': np.array([s['i'] for s in samples]),
            'x': np.stack([s['x'] for s in samples])}


def test_loader_process_workers_match_thread_path():
    """num_workers>0 (spawn pool) must yield the same batches, in the
    same order, as the default background-thread path."""
    from proxytransformation_tpu.data.loader import DataLoader
    ds = _SeqDataset(13)
    kw = dict(batch_size=3, collate_fn=_seq_collate, shuffle=True, seed=7)
    a = list(iter(DataLoader(ds, **kw)))
    b = list(iter(DataLoader(ds, num_workers=2, **kw)))
    assert len(a) == len(b) == 4
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x['i'], y['i'])
        np.testing.assert_array_equal(x['x'], y['x'])


def test_vis_backend_registry():
    from proxytransformation_tpu.utils.registry import VISBACKENDS
    from proxytransformation_tpu.utils import vis_backend  # noqa: F401
    assert 'LocalVisBackend' in VISBACKENDS
    assert 'WandbVisBackend' in VISBACKENDS
