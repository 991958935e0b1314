# Multi-view 3D detection pretraining config — parity with the
# reference detection setup that produces the grounder's warm-start
# checkpoint (reference configs/...clip.py:247 ckpt name
# `multiview-detection-resnet50-8gpu-bs4-baselr-cbgs`).
_base_ = ['../default_runtime.py']
n_points = 100000

metainfo = dict(classes='all')

model = dict(
    type='Embodied3DDetector',
    voxel_size=0.01,
    n_points=n_points,
    num_classes=284,
    data_preprocessor=dict(type='Det3DDataPreprocessor',
                           mean=[123.675, 116.28, 103.53],
                           std=[58.395, 57.12, 57.375],
                           bgr_to_rgb=True,
                           pad_size_divisor=32),
    backbone=dict(type='ResNet', depth=50, base_channels=16),
    backbone_3d=dict(type='MinkResNet', in_channels=3, depth=34,
                     capacities=(100000, 80000, 50000, 20000, 6000, 2000)),
    bbox_head=dict(type='FCAF3DHead',
                   num_classes=284,
                   in_channels=(128, 256, 512, 1024),
                   out_channels=128,
                   num_reg_outs=9,
                   voxel_size=0.01,
                   pts_prune_threshold=1000,
                   pts_assign_threshold=27,
                   pts_center_threshold=18),
    coord_type='DEPTH',
    test_cfg=dict(nms_pre=1000, iou_thr=0.5, score_thr=0.01),
)

dataset_type = 'EmbodiedScanDataset'
data_root = 'data/embodiedscan/'
n_views = 20

train_pipeline = [
    dict(type='LoadAnnotations3D'),
    dict(type='MultiViewPipeline',
         n_images=20,
         transforms=[
             dict(type='LoadImageFromFile'),
             dict(type='LoadDepthFromFile'),
             dict(type='ConvertRGBDToPoints', coord_type='CAMERA'),
             dict(type='PointSample', num_points=n_points // 10),
             dict(type='Resize', scale=(480, 480), keep_ratio=False),
         ]),
    dict(type='AggregateMultiViewPoints', coord_type='DEPTH'),
    dict(type='PointSample', num_points=n_points),
    dict(type='GlobalRotScaleTrans',
         rot_range=[-0.087266, 0.087266],
         scale_ratio_range=[.9, 1.1],
         translation_std=[.1, .1, .1]),
    dict(type='RandomFlip3D', sync_2d=False,
         flip_ratio_bev_horizontal=0.5,
         flip_ratio_bev_vertical=0.5),
    dict(type='Pack3DDetInputs',
         keys=['img', 'points', 'gt_bboxes_3d', 'gt_labels_3d']),
]

train_dataloader = dict(
    batch_size=4,
    sampler=dict(type='DefaultSampler', shuffle=True),
    dataset=dict(type=dataset_type,
                 data_root=data_root,
                 ann_file='embodiedscan_infos_train.pkl',
                 metainfo=metainfo,
                 pipeline=train_pipeline,
                 test_mode=False,
                 filter_empty_gt=True))

val_evaluator = dict(type='IndoorDetMetric')

train_cfg = dict(type='EpochBasedTrainLoop', max_epochs=12, val_interval=12)
lr = 1e-3
optim_wrapper = dict(optimizer=dict(type='AdamW', lr=lr, weight_decay=1e-4),
                     clip_grad=dict(max_norm=10, norm_type=2))
param_scheduler = dict(type='MultiStepLR', milestones=[8, 11], gamma=0.1)
