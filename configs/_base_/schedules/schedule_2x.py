# 24-epoch step schedule (reference configs/_base_/schedules/schedule_2x.py):
# AdamW, step LR decay at epochs [20, 23] with 1k-iter linear warmup.
optimizer = dict(type='AdamW', lr=0.001, betas=(0.95, 0.99),
                 weight_decay=0.01)
grad_clip = 35.0
lr_config = dict(policy='step', warmup='linear', warmup_iters=1000,
                 warmup_ratio=1.0 / 1000, step=[20, 23])
momentum_config = None
max_epochs = 24
