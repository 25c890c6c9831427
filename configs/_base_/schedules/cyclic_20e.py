# 20-epoch one-cycle schedule for nuScenes models (reference
# configs/_base_/schedules/cyclic_20e.py): AdamW lr 1e-4, cyclic LR and
# momentum over one cycle.
optimizer = dict(type='AdamW', lr=1e-4, betas=(0.95, 0.99),
                 weight_decay=0.01)
grad_clip = 35.0
lr_config = dict(policy='cyclic', target_ratio=(10, 1e-4), cyclic_times=1,
                 step_ratio_up=0.4)
momentum_config = dict(policy='cyclic', target_ratio=(0.85 / 0.95, 1),
                       cyclic_times=1, step_ratio_up=0.4)
max_epochs = 20
