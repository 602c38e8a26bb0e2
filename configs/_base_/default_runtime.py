# runtime defaults (reference: configs/_base_/default_runtime.py)
checkpoint_config = dict(interval=1, max_keep_ckpts=3)
log_config = dict(interval=50)
dist_params = dict(backend="gspmd")  # XLA collectives; no NCCL init
log_level = "INFO"
work_dir = None
load_from = None
resume_from = None
workflow = [("train", 1)]
