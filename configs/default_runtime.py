# Default runtime (reference surface: configs/default_runtime.py)
default_scope = 'proxytransformation_tpu'

default_hooks = dict(
    timer=dict(type='IterTimerHook'),
    logger=dict(type='LoggerHook', interval=50),
    param_scheduler=dict(type='ParamSchedulerHook'),
    checkpoint=dict(type='CheckpointHook', interval=1, max_keep_ckpts=4),
    sampler_seed=dict(type='DistSamplerSeedHook'),
)

log_interval = 50
log_level = 'INFO'
load_from = None
resume = False
seed = 0
