"""Cyclic 20-epoch schedule (mirror of
/root/reference/configs/_base_/schedules/cyclic_20e.py: AdamW lr 1e-4,
one cycle x10 -> x1e-4, grad clip 35, 20 epochs — nuScenes models)."""
optimizer = dict(
    lr=1e-4, betas=(0.95, 0.99), weight_decay=0.01, grad_clip=35.0,
    lr_target_ratio=(10, 1e-4),
    momentum_target_ratio=(0.8947368421052632, 1.0),
    step_ratio_up=0.4)
max_epochs = 20
