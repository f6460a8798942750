"""Runtime defaults (behavioral mirror of
/root/reference/configs/_base_/default_runtime.py: checkpoint every
epoch, text logging every 50 iters, dist params)."""
checkpoint_interval = 1   # epochs
log_interval = 50         # steps
eval_interval = 5         # epochs
seed = 0
resume_from = None
load_from = None
work_dir = None
