# Flagship grounding config — parity with the reference config
# configs/grounding/proxy-tiblock33-gs12-wbias-ddr0.6-clip.py
_base_ = ['../default_runtime.py']
n_points = 100000

metainfo = dict(classes='all')

model = dict(
    type='SparseFeatureFusion3DGrounderPreshape',
    num_queries=256,
    voxel_size=0.01,
    n_points=n_points,
    use_xyz_feat=True,
    data_preprocessor=dict(type='Det3DDataPreprocessor',
                           mean=[123.675, 116.28, 103.53],
                           std=[58.395, 57.12, 57.375],
                           bgr_to_rgb=True,
                           pad_size_divisor=32),
    backbone=dict(type='ResNet', depth=50, base_channels=16),
    preshape=dict(type='ProxyTransformationNormReverse',
                  n_points=n_points, grid_size=12, text_blocks=3,
                  img_blocks=3, dynamic_drop_radio=0.6, num_sub=30),
    backbone_3d=dict(type='MinkResNet', in_channels=3, depth=34,
                     capacities=(100000, 80000, 50000, 20000, 6000, 2000)),
    neck_3d=dict(type='MinkNeck', num_classes=1,
                 in_channels=[128, 256, 512, 1024], out_channels=256,
                 voxel_size=0.01, pts_prune_threshold=1000),
    decoder=dict(num_layers=6, return_intermediate=True),
    coord_type='DEPTH',
    img_spacial_dim=15,  # 480 / 32
    max_text_len=256,
    # reference-scale training (B=6, 100k pts, 20 views) does not fit
    # 16 GB HBM without rematerialization: the f32 no-remat step needs
    # ~15.6 GB of temporaries alone (BASELINE.md). Train with --amp
    # (bfloat16 compute) exactly like the reference trains with --amp.
    remat=True,
)

dataset_type = 'MultiView3DGroundingDataset'
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
         translation_std=[.1, .1, .1],
         shift_height=False),
    dict(type='Pack3DDetInputs',
         keys=['img', 'points', 'gt_bboxes_3d', 'gt_labels_3d']),
]
test_pipeline = [
    dict(type='LoadAnnotations3D'),
    dict(type='MultiViewPipeline',
         n_images=50,
         ordered=True,
         transforms=[
             dict(type='LoadImageFromFile'),
             dict(type='LoadDepthFromFile'),
             dict(type='ConvertRGBDToPoints', coord_type='CAMERA'),
             dict(type='PointSample', num_points=n_points // 10),
             dict(type='Resize', scale=(480, 480), keep_ratio=False),
         ]),
    dict(type='AggregateMultiViewPoints', coord_type='DEPTH'),
    dict(type='PointSample', num_points=n_points),
    dict(type='Pack3DDetInputs',
         keys=['img', 'points', 'gt_bboxes_3d', 'gt_labels_3d']),
]

train_dataloader = dict(
    batch_size=6,
    num_workers=6,
    sampler=dict(type='DefaultSampler', shuffle=True),
    dataset=dict(type='RepeatDataset',
                 times=1,
                 dataset=dict(type=dataset_type,
                              data_root=data_root,
                              ann_file='embodiedscan_infos_train.pkl',
                              vg_file='embodiedscan_train_vg.json',
                              metainfo=metainfo,
                              pipeline=train_pipeline,
                              test_mode=False,
                              filter_empty_gt=True,
                              box_type_3d='Euler-Depth')))

val_dataloader = dict(batch_size=1,
                      num_workers=1,
                      sampler=dict(type='DefaultSampler', shuffle=False),
                      dataset=dict(type=dataset_type,
                                   data_root=data_root,
                                   ann_file='embodiedscan_infos_val.pkl',
                                   vg_file='embodiedscan_val_vg.json',
                                   metainfo=metainfo,
                                   pipeline=test_pipeline,
                                   test_mode=True,
                                   filter_empty_gt=True,
                                   box_type_3d='Euler-Depth'))
test_dataloader = val_dataloader

val_evaluator = dict(type='GroundingMetric')
test_evaluator = dict(type='GroundingMetric', format_only=True)

train_cfg = dict(type='EpochBasedTrainLoop', max_epochs=12, val_interval=3)
val_cfg = dict(type='ValLoop')
test_cfg = dict(type='TestLoop')

lr = 5e-4
optim_wrapper = dict(type='OptimWrapper',
                     optimizer=dict(type='AdamW', lr=lr, weight_decay=0.0005),
                     paramwise_cfg=dict(
                         custom_keys={
                             'text_encoder': dict(lr_mult=0.0),
                             'decoder': dict(lr_mult=0.1, decay_mult=1.0),
                         }),
                     clip_grad=dict(max_norm=10, norm_type=2))

param_scheduler = dict(type='MultiStepLR', begin=0, end=12, by_epoch=True,
                       milestones=[8, 11], gamma=0.1)

default_hooks = dict(
    checkpoint=dict(type='CheckpointHook', interval=1, max_keep_ckpts=2))

load_from = None  # set to a detection checkpoint dir for warm start
