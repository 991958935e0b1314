# Tiny synthetic occupancy config: the Runner trains
# EmbodiedOccPredictor through the same tools/train.py path as the
# reference occupancy task (reference models/detectors/embodied_occ.py).
_base_ = ['../default_runtime.py']
n_points = 1024

model = dict(
    type='EmbodiedOccPredictor',
    n_voxels=(16, 16, 8),
    voxel_range=(0.0, 0.0, 0.0, 5.0, 5.0, 2.5),
    num_classes=6,
    data_preprocessor=dict(type='Det3DDataPreprocessor',
                           n_points=n_points, n_views=4, max_gts=4,
                           max_text_len=64, max_occ=64),
    backbone=dict(type='ResNet', depth=50, base_channels=4),
    neck_3d=dict(type='IndoorImVoxelNeck', out_channels=16),
    bbox_head=dict(type='ImVoxelOccHead', num_classes=6,
                   use_semantic=True),
)

train_dataloader = dict(
    batch_size=2,
    sampler=dict(type='DefaultSampler', shuffle=True),
    dataset=dict(type='SyntheticOccupancyDataset', length=4,
                 n_points=n_points, n_views=4, img_size=96,
                 n_voxels=(16, 16, 8), num_classes=6, n_occupied=64))

val_dataloader = dict(
    batch_size=2,
    sampler=dict(type='DefaultSampler', shuffle=False),
    dataset=dict(type='SyntheticOccupancyDataset', length=2,
                 n_points=n_points, n_views=4, img_size=96, seed=7,
                 n_voxels=(16, 16, 8), num_classes=6, n_occupied=64,
                 test_mode=True))

val_evaluator = dict(type='OccupancyMetric', num_classes=6)

train_cfg = dict(type='EpochBasedTrainLoop', max_epochs=1, val_interval=1)
lr = 1e-4
optim_wrapper = dict(optimizer=dict(type='AdamW', lr=lr,
                                    weight_decay=0.01),
                     clip_grad=dict(max_norm=35, norm_type=2))
param_scheduler = dict(type='MultiStepLR', milestones=[16, 22], gamma=0.1)
log_interval = 1
