"""Cyclic AdamW schedule for KITTI (mirror of
/root/reference/configs/_base_/schedules/cyclic_40e.py: AdamW lr 0.0018
betas (0.95, 0.99) wd 0.01, grad clip 10, one cycle lr x10 -> x1e-4,
momentum 0.85/0.95 -> 1, 40 epochs)."""
optimizer = dict(
    lr=0.0018, betas=(0.95, 0.99), weight_decay=0.01, grad_clip=10.0,
    lr_target_ratio=(10, 1e-4),
    momentum_target_ratio=(0.8947368421052632, 1.0),
    step_ratio_up=0.4)
max_epochs = 40
