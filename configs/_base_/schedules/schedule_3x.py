"""Indoor 3x schedule (mirror of
/root/reference/configs/_base_/schedules/schedule_3x.py: AdamW lr 0.008
wd 0.01, step decay x0.1 at epochs 24 and 32, grad clip 10, 36 epochs)."""
optimizer = dict(
    lr=0.008, weight_decay=0.01, grad_clip=10.0,
    lr_policy='step', lr_steps=(24, 32), lr_gamma=0.1)
max_epochs = 36
