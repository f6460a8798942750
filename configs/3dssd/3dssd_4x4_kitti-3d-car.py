"""3DSSD KITTI car (mirror of
/root/reference/configs/3dssd/3dssd_4x4_kitti-3d-car.py: AdamW lr 0.002
wd 0, steps (45, 60), 80 epochs, 16384-point samples, range
[0, -40, -5, 70, 40, 3])."""
_base_ = [
    '../_base_/models/3dssd.py',
    '../_base_/datasets/kitti-3d-car.py',
    '../_base_/default_runtime.py',
]
point_cloud_range = [0, -40, -5, 70, 40, 3]
optimizer = dict(lr=0.002, weight_decay=0.0, grad_clip=10.0,
                 lr_policy='step', lr_steps=(45, 60), lr_gamma=0.1)
data = dict(samples_per_gpu=4, max_points=16384)
max_epochs = 80
