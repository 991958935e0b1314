# Tiny synthetic end-to-end config for smoke tests / CI.
_base_ = ['../default_runtime.py']
n_points = 2048

model = dict(
    type='SparseFeatureFusion3DGrounderPreshape',
    num_queries=32,
    voxel_size=0.05,
    n_points=n_points,
    data_preprocessor=dict(type='Det3DDataPreprocessor',
                           n_points=n_points, n_views=4, max_gts=4,
                           max_text_len=64),
    backbone=dict(type='ResNet', depth=50, base_channels=4),
    preshape=dict(type='ProxyTransformationNormReverse',
                  n_points=n_points, grid_size=4, text_blocks=2,
                  img_blocks=2, dynamic_drop_radio=0.5, num_sub=8),
    backbone_3d=dict(type='MinkResNet', in_channels=3, depth=14,
                     capacities=(2048, 1600, 1024, 512, 256, 128)),
    neck_3d=dict(type='MinkNeck', num_classes=1, out_channels=64,
                 voxel_size=0.05, pts_prune_threshold=128),
    decoder=dict(num_layers=2),
    img_spacial_dim=3,  # 96 / 32
    max_text_len=64,
    text_width=64,
    text_layers=2,
    text_heads=4,
    embed_dims=64,
    num_heads=4,
    ffn_channels=128,
    voxel_extent=(128, 128, 128),
)

n_views = 4

train_dataloader = dict(
    batch_size=2,
    sampler=dict(type='DefaultSampler', shuffle=True),
    dataset=dict(type='SyntheticGroundingDataset', length=8,
                 n_points=n_points, n_views=4, img_size=96))

val_dataloader = dict(
    batch_size=2,
    sampler=dict(type='DefaultSampler', shuffle=False),
    dataset=dict(type='SyntheticGroundingDataset', length=4,
                 n_points=n_points, n_views=4, img_size=96, seed=7,
                 test_mode=True))

val_evaluator = dict(type='GroundingMetric')

train_cfg = dict(type='EpochBasedTrainLoop', max_epochs=1, val_interval=1)
lr = 1e-4
optim_wrapper = dict(optimizer=dict(type='AdamW', lr=lr,
                                    weight_decay=0.0005),
                     clip_grad=dict(max_norm=10, norm_type=2))
param_scheduler = dict(type='MultiStepLR', milestones=[8, 11], gamma=0.1)
log_interval = 1
