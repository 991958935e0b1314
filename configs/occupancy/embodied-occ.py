# Occupancy prediction config (reference's occupancy task surface).
_base_ = ['../default_runtime.py']

model = dict(
    type='EmbodiedOccPredictor',
    n_voxels=(40, 40, 16),
    voxel_range=(-3.2, -3.2, -0.78, 3.2, 3.2, 1.78),
    num_classes=81,
    data_preprocessor=dict(type='Det3DDataPreprocessor',
                           mean=[123.675, 116.28, 103.53],
                           std=[58.395, 57.12, 57.375],
                           bgr_to_rgb=True,
                           pad_size_divisor=32),
    backbone=dict(type='ResNet', depth=50, base_channels=16),
    neck_3d=dict(type='IndoorImVoxelNeck', out_channels=128),
    bbox_head=dict(type='ImVoxelOccHead', num_classes=81,
                   use_semantic=True),
)

dataset_type = 'EmbodiedScanDataset'
data_root = 'data/embodiedscan/'

val_evaluator = dict(type='OccupancyMetric', num_classes=81)

train_cfg = dict(type='EpochBasedTrainLoop', max_epochs=24, val_interval=24)
lr = 1e-4
optim_wrapper = dict(optimizer=dict(type='AdamW', lr=lr, weight_decay=1e-2),
                     clip_grad=dict(max_norm=35, norm_type=2))
param_scheduler = dict(type='MultiStepLR', milestones=[16, 22], gamma=0.1)
