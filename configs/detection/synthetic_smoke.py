# Tiny synthetic detection config: the Runner trains Embodied3DDetector
# through the same tools/train.py path as the reference detection
# pretraining (reference tools/train.py:151-163), producing the
# checkpoint the grounder warm-starts from (configs/...clip.py:247).
_base_ = ['../default_runtime.py']
n_points = 2048

model = dict(
    type='Embodied3DDetector',
    voxel_size=0.05,
    n_points=n_points,
    num_classes=8,
    data_preprocessor=dict(type='Det3DDataPreprocessor',
                           n_points=n_points, n_views=4, max_gts=4,
                           max_text_len=64),
    backbone=dict(type='ResNet', depth=50, base_channels=4),
    backbone_3d=dict(type='MinkResNet', in_channels=3, depth=14,
                     capacities=(2048, 1600, 1024, 512, 256, 128)),
    bbox_head=dict(type='FCAF3DHead', num_classes=8,
                   out_channels=32, num_reg_outs=9,
                   voxel_size=0.05, pts_prune_threshold=64),
    voxel_extent=(128, 128, 128),
    test_cfg=dict(nms_pre=64, iou_thr=0.5, score_thr=0.01),
)

train_dataloader = dict(
    batch_size=2,
    sampler=dict(type='DefaultSampler', shuffle=True),
    dataset=dict(type='SyntheticGroundingDataset', length=4,
                 n_points=n_points, n_views=4, img_size=96))

val_dataloader = dict(
    batch_size=2,
    sampler=dict(type='DefaultSampler', shuffle=False),
    dataset=dict(type='SyntheticGroundingDataset', length=2,
                 n_points=n_points, n_views=4, img_size=96, seed=7,
                 test_mode=True))

val_evaluator = dict(type='IndoorDetMetric')

train_cfg = dict(type='EpochBasedTrainLoop', max_epochs=1, val_interval=1)
lr = 1e-4
optim_wrapper = dict(optimizer=dict(type='AdamW', lr=lr,
                                    weight_decay=0.0005),
                     clip_grad=dict(max_norm=10, norm_type=2))
param_scheduler = dict(type='MultiStepLR', milestones=[8, 11], gamma=0.1)
log_interval = 1
