"""Dependency-light offline grounding scorer (numpy only).

Mirror of the reference `tools/eval_script_portable.py:1-378`: a fully
standalone re-implementation of the box geometry and metric (no jax, no
framework imports) so dumped `test_results.json` files can be re-scored
anywhere — and it doubles as an independent oracle for the in-framework
metric (SURVEY §4.2).
"""
import argparse
import json
from itertools import combinations

import numpy as np

_TRIPLES = np.array(list(combinations(range(12), 3)))


def euler_zxy_to_matrix(angles):
    a, b, c = angles[..., 0], angles[..., 1], angles[..., 2]

    def rz(t):
        ct, st = np.cos(t), np.sin(t)
        o, z = np.ones_like(t), np.zeros_like(t)
        return np.stack([np.stack([ct, -st, z], -1),
                         np.stack([st, ct, z], -1),
                         np.stack([z, z, o], -1)], -2)

    def rx(t):
        ct, st = np.cos(t), np.sin(t)
        o, z = np.ones_like(t), np.zeros_like(t)
        return np.stack([np.stack([o, z, z], -1),
                         np.stack([z, ct, -st], -1),
                         np.stack([z, st, ct], -1)], -2)

    def ry(t):
        ct, st = np.cos(t), np.sin(t)
        o, z = np.ones_like(t), np.zeros_like(t)
        return np.stack([np.stack([ct, z, st], -1),
                         np.stack([z, o, z], -1),
                         np.stack([-st, z, ct], -1)], -2)

    return rz(a) @ rx(b) @ ry(c)


def box_planes(box9):
    center, half = box9[:3], box9[3:6] / 2
    rot = euler_zxy_to_matrix(box9[6:9])
    axes = rot.T
    normals = np.concatenate([axes, -axes], 0)
    offsets = normals @ center + np.concatenate([half, half])
    return normals, offsets


def intersection_volume(box1, box2, eps=1e-4):
    n1, b1 = box_planes(box1)
    n2, b2 = box_planes(box2)
    A = np.concatenate([n1, n2], 0)
    b = np.concatenate([b1, b2], 0)
    feas_eps = eps * max(np.abs(b).max(), 1.0)

    a0, a1, a2 = A[_TRIPLES[:, 0]], A[_TRIPLES[:, 1]], A[_TRIPLES[:, 2]]
    c12 = np.cross(a1, a2)
    det = np.sum(a0 * c12, -1)
    ok = np.abs(det) > 1e-7
    safe = np.where(ok, det, 1.0)
    verts = (b[_TRIPLES[:, 0], None] * c12
             + b[_TRIPLES[:, 1], None] * np.cross(a2, a0)
             + b[_TRIPLES[:, 2], None] * np.cross(a0, a1)) / safe[:, None]
    verts = np.where(ok[:, None], verts, 0.0)
    slack = verts @ A.T - b
    feasible = ok & np.all(slack <= feas_eps, -1)
    verts = np.where(feasible[:, None], verts, 0.0)
    on_plane = feasible[None, :] & (np.abs(verts @ A.T - b).T <= feas_eps)

    alt = np.where(np.abs(A[:, :1]) < 0.9, [1.0, 0, 0], [0, 1.0, 0])
    u = np.cross(A, alt)
    u /= np.linalg.norm(u, axis=-1, keepdims=True)
    w = np.cross(A, u)
    m = on_plane.astype(np.float64)
    cnt = np.maximum(m.sum(1, keepdims=True), 1.0)
    ctr = (m @ verts) / cnt
    rel = verts[None] - ctr[:, None]
    pu = np.sum(rel * u[:, None], -1)
    pw = np.sum(rel * w[:, None], -1)
    ang = np.where(on_plane, np.arctan2(pw, pu), 1e9)
    order = np.argsort(ang, 1)
    pu_s = np.take_along_axis(pu, order, 1)
    pw_s = np.take_along_axis(pw, order, 1)
    ms = np.take_along_axis(on_plane, order, 1)
    pu_f = np.where(ms, pu_s, pu_s[:, :1])
    pw_f = np.where(ms, pw_s, pw_s[:, :1])
    cross = pu_f * np.roll(pw_f, -1, 1) - pw_f * np.roll(pu_f, -1, 1)
    area = 0.5 * np.abs(cross.sum(1))

    same = (A @ A.T > 1 - 1e-6) & (np.abs(b[:, None] - b[None]) <= feas_eps)
    dup = np.any(same & (np.arange(12)[None] < np.arange(12)[:, None]), 1)
    vol = np.sum(np.where(dup, 0.0, b * area)) / 3.0
    return max(vol, 0.0)


def box_iou(boxes1, boxes2):
    out = np.zeros((len(boxes1), len(boxes2)))
    v1 = np.prod(np.abs(boxes1[:, 3:6]), -1)
    v2 = np.prod(np.abs(boxes2[:, 3:6]), -1)
    for i, b1 in enumerate(boxes1):
        for j, b2 in enumerate(boxes2):
            inter = intersection_volume(b1, b2)
            out[i, j] = inter / max(v1[i] + v2[j] - inter, 1e-8)
    return out


def ground_eval(gt_annos, det_annos, iou_thr=(0.25, 0.5), top_k=10):
    types = ['Easy', 'Hard', 'View-Dep', 'View-Indep', 'Unique', 'Multi',
             'Overall']
    pred = {f'{o}@{t}': 0 for t in iou_thr for o in types}
    gt = {f'{o}@{t}': 1e-14 for t in iou_thr for o in types}
    for d, g in zip(det_annos, gt_annos):
        scores = np.asarray(d['target_scores_3d'])
        boxes = np.asarray(d['bboxes_3d']).reshape(-1, 9)
        gtb = np.asarray(g['gt_bboxes_3d']).reshape(-1, 9)
        top = boxes[np.argsort(-scores)[:top_k]]
        iou = box_iou(top, gtb) if len(gtb) else np.zeros((len(top), 1))
        for t in iou_thr:
            found = int((iou > t).any())
            for bkt in [('View-Dep' if g['is_view_dep'] else 'View-Indep'),
                        ('Hard' if g['is_hard'] else 'Easy'),
                        ('Unique' if g['is_unique'] else 'Multi'),
                        'Overall']:
                gt[f'{bkt}@{t}'] += 1
                pred[f'{bkt}@{t}'] += found
    return {k: pred[k] / max(gt[k], 1) for k in pred}


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('results')
    parser.add_argument('gt')
    parser.add_argument('--top-k', type=int, default=10)
    args = parser.parse_args()
    with open(args.results) as f:
        results = json.load(f)
    with open(args.gt) as f:
        gts = json.load(f)
    det = [{'bboxes_3d': r['bboxes_3d'],
            'target_scores_3d': r['scores_3d']} for r in results]
    gt = [{'gt_bboxes_3d': g['gt_bboxes_3d'],
           'is_hard': g.get('is_hard', False),
           'is_view_dep': g.get('is_view_dep', False),
           'is_unique': g.get('is_unique', False)} for g in gts]
    print(json.dumps({k: round(v, 4)
                      for k, v in ground_eval(gt, det,
                                              top_k=args.top_k).items()},
                     indent=2))


if __name__ == '__main__':
    main()
