"""Cosine-annealing AdamW schedule (mirror of
/root/reference/configs/_base_/schedules/cosine.py: AdamW lr 0.003
wd 0.001, warmup 1000 iters x1/10, cosine to lr*1e-4, grad clip 10)."""
optimizer = dict(
    lr=0.003, betas=(0.95, 0.99), weight_decay=0.001, grad_clip=10.0,
    lr_policy='cosine', warmup_iters=1000, warmup_ratio=0.1,
    min_lr_ratio=1e-4)
max_epochs = 40
