# One-cycle AdamW schedule (reference configs/_base_/schedules/cyclic_40e.py)
optimizer = dict(type='AdamW', lr=0.0018, betas=(0.95, 0.99),
                 weight_decay=0.01)
grad_clip = 10.0
lr_config = dict(policy='cyclic', target_ratio=(10, 1e-4), cyclic_times=1,
                 step_ratio_up=0.4)
# Cyclic momentum per SECOND's one-cycle recipe (reference cyclic_40e.py
# momentum_config): beta1 cycles 0.95*(0.85/0.95) -> 0.95.
momentum_config = dict(policy='cyclic', target_ratio=(0.85 / 0.95, 1),
                       cyclic_times=1, step_ratio_up=0.4)
max_epochs = 40
