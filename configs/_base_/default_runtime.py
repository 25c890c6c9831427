# Runtime defaults (reference configs/_base_/default_runtime.py:1-18).
# These are CONFIG keys; the matching CLI flags in tools/train.py override
# them when given (resolution: CLI -> config -> default).
checkpoint_config = dict(interval=1)      # epochs between checkpoints
log_config = dict(interval=50)            # steps between jsonl log lines
evaluation = dict(interval=0)             # epochs between val runs (0 = off)
log_level = 'INFO'
work_dir = None
load_from = None                          # weights-only warm start
resume_from = None                        # full train-state resume
workflow = [('train', 1)]                 # accepted for parity; only
#                                           ('train', N) is meaningful here
