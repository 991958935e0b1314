"""Input-pipeline throughput at reference scale.

The reference runs 6 torch DataLoader workers with SharedArray-backed
caching (reference configs/...clip.py:149, utils/shared_mem_utils.py,
datasets/mv_3dvg_dataset_optimized.py); the rebuild uses a host-side
prefetch loader (data/loader.py). This measures whether host data prep
keeps up with the ~3 s/batch B=6 train step: it writes a
reference-scale mini dataset to disk (ScanNet-sized 1296x968 JPEG RGB +
640x480 16-bit PNG depth, 20 views per sample), then times per-stage
sample prep, collate, and the steady-state loader.

Run from /root/repo:
    python tools/profile_dataloader.py [--scans 4] [--views 24]
        [--batch 6] [--n-batches 4] [--workers N]
"""
import argparse
import json
import os
import pickle
import shutil
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, '.')


def make_dataset(root: str, n_scans: int, n_views: int):
    """Reference-sized scans: RGB 1296x968 JPEG + depth 640x480 PNG."""
    import cv2
    rng = np.random.RandomState(0)
    H, W = 968, 1296
    DH, DW = 480, 640
    cam2img = np.array([[577.6, 0, W / 2, 0], [0, 577.6, H / 2, 0],
                        [0, 0, 1, 0], [0, 0, 0, 1]], np.float32)
    dep2img = np.array([[577.6, 0, DW / 2, 0], [0, 577.6, DH / 2, 0],
                        [0, 0, 1, 0], [0, 0, 0, 1]], np.float32)
    categories = {'chair': 0, 'table': 1, 'bed': 2}
    data_list, vg = [], []
    # one textured image reused per scan (decode cost is content-
    # independent at matched entropy; noise JPEGs are the slow case)
    for s in range(n_scans):
        scan_id = f'scannet/scene{s:04d}_00'
        scan_dir = os.path.join(root, f'scene{s:04d}_00')
        os.makedirs(scan_dir, exist_ok=True)
        images = []
        img = rng.randint(0, 255, (H, W, 3)).astype(np.uint8)
        img = cv2.GaussianBlur(img, (0, 0), 3.0)  # natural-ish spectrum
        depth = rng.randint(800, 2500, (DH, DW)).astype(np.uint16)
        for v in range(n_views):
            ip = os.path.join(scan_dir, f'{v:05d}.jpg')
            dp = os.path.join(scan_dir, f'{v:05d}.png')
            if v == 0:
                cv2.imwrite(ip, img)
                cv2.imwrite(dp, depth)
            else:  # same bytes, distinct files: decode cost (the part
                #     being measured) is per-read, not per-unique-file
                os.link(os.path.join(scan_dir, '00000.jpg'), ip)
                os.link(os.path.join(scan_dir, '00000.png'), dp)
            cam2global = np.eye(4, dtype=np.float64)
            cam2global[:3, 3] = [0.1 * v, 0.05 * v, 0.0]
            images.append({'img_path': os.path.relpath(ip, root),
                           'depth_path': os.path.relpath(dp, root),
                           'cam2global': cam2global})
        instances = [
            {'bbox_3d': [0.0, 0.0, 1.5, 1.0, 1.0, 1.0, 0, 0, 0],
             'bbox_label_3d': 0, 'bbox_id': 0},
            {'bbox_3d': [0.8, -0.5, 1.2, 0.8, 0.6, 0.5, 0.1, 0, 0],
             'bbox_label_3d': 1, 'bbox_id': 1},
        ]
        data_list.append({'sample_idx': scan_id,
                          'axis_align_matrix': np.eye(4, dtype=np.float64),
                          'cam2img': cam2img, 'depth_cam2img': dep2img,
                          'images': images, 'instances': instances})
        for t in range(8):
            vg.append({'scan_id': scan_id,
                       'text': 'the chair next to the table',
                       'target_id': 0, 'distractor_ids': [],
                       'tokens_positive': [[4, 9]]})
    infos = {'metainfo': {'categories': categories}, 'data_list': data_list}
    with open(os.path.join(root, 'infos_train.pkl'), 'wb') as f:
        pickle.dump(infos, f)
    with open(os.path.join(root, 'vg_train.json'), 'w') as f:
        json.dump(vg, f)


def build_pipeline(root: str, n_points: int, n_views: int):
    import proxytransformation_tpu.data  # noqa: F401
    from proxytransformation_tpu.utils.registry import DATASETS
    pipeline = [
        dict(type='LoadAnnotations3D'),
        dict(type='MultiViewPipeline', n_images=n_views,
             transforms=[
                 dict(type='LoadImageFromFile'),
                 dict(type='LoadDepthFromFile'),
                 dict(type='ConvertRGBDToPoints', coord_type='CAMERA'),
                 dict(type='PointSample', num_points=n_points // 10),
                 dict(type='Resize', scale=(480, 480), keep_ratio=False),
             ]),
        dict(type='AggregateMultiViewPoints', coord_type='DEPTH'),
        dict(type='PointSample', num_points=n_points),
        dict(type='GlobalRotScaleTrans', rot_range=[-0.087266, 0.087266],
             scale_ratio_range=[.9, 1.1], translation_std=[.1, .1, .1],
             shift_height=False),
        dict(type='Pack3DDetInputs',
             keys=['img', 'points', 'gt_bboxes_3d', 'gt_labels_3d']),
    ]
    return DATASETS.build(dict(type='MultiView3DGroundingDataset',
                               data_root=root,
                               ann_file='infos_train.pkl',
                               vg_file='vg_train.json',
                               pipeline=pipeline,
                               test_mode=False))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--scans', type=int, default=4)
    ap.add_argument('--views', type=int, default=24)
    ap.add_argument('--n-views', type=int, default=20)
    ap.add_argument('--batch', type=int, default=6)
    ap.add_argument('--n-batches', type=int, default=4)
    ap.add_argument('--n-points', type=int, default=100_000)
    ap.add_argument('--workers', type=int, default=0)
    ap.add_argument('--keep', action='store_true')
    args = ap.parse_args()

    root = tempfile.mkdtemp(prefix='pt_dataprof_')
    try:
        t0 = time.perf_counter()
        make_dataset(root, args.scans, args.views)
        print(json.dumps({'stage': 'make_dataset',
                          's': round(time.perf_counter() - t0, 2)}),
              flush=True)

        ds = build_pipeline(root, args.n_points, args.n_views)
        from proxytransformation_tpu.data import (DataLoader,
                                                  Det3DDataPreprocessor)
        pp = Det3DDataPreprocessor(n_points=args.n_points,
                                   n_views=args.n_views, max_gts=8,
                                   max_text_len=256)

        # per-sample prep (decode 20 views + aggregate + sample 100k)
        t0 = time.perf_counter()
        samples = [ds[i] for i in range(args.batch)]
        per_sample = (time.perf_counter() - t0) / args.batch
        print(json.dumps({'stage': 'sample_prep',
                          's_per_sample': round(per_sample, 3)}),
              flush=True)

        t0 = time.perf_counter()
        pp(samples)
        print(json.dumps({'stage': 'collate',
                          's_per_batch': round(time.perf_counter() - t0,
                                               3)}), flush=True)

        # steady-state loader
        loader = DataLoader(ds, args.batch, pp, shuffle=True,
                            num_workers=args.workers)
        it = iter(loader)
        next(it)  # warm-up (thread spin-up, caches)
        t0 = time.perf_counter()
        n = 0
        for _ in range(args.n_batches):
            try:
                next(it)
                n += 1
            except StopIteration:
                break
        dt = time.perf_counter() - t0
        it.close()
        sec_per_batch = dt / max(n, 1)
        result = {
            'metric': 'input_pipeline_s_per_batch',
            'value': round(sec_per_batch, 3),
            'unit': f's/batch(B={args.batch})',
            'scenes_per_sec': round(args.batch / sec_per_batch, 2),
            'workers': args.workers,
            'train_step_s': 3.0,
            'keeps_up_with_train_step': sec_per_batch < 3.0,
        }
        print(json.dumps(result), flush=True)
    finally:
        if args.keep:
            print('kept', root)
        else:
            shutil.rmtree(root, ignore_errors=True)


if __name__ == '__main__':
    main()
