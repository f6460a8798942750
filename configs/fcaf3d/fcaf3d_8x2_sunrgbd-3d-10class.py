"""FCAF3D SUN RGB-D 10-class (mirror of
/root/reference/configs/fcaf3d/fcaf3d_8x2_sunrgbd-3d-10class.py: yaw
boxes, n_reg_outs=8; the GGA paper's indoor result table rides this)."""
_base_ = [
    '../_base_/models/fcaf3d.py',
    '../_base_/datasets/sunrgbd-3d-10class.py',
    '../_base_/default_runtime.py',
]
model = dict(head=dict(n_classes=10, n_reg_outs=8, with_yaw=True))
optimizer = dict(lr=0.001, weight_decay=0.0001, grad_clip=10.0,
                 lr_policy='step', lr_steps=(8, 11), lr_gamma=0.1)
data = dict(samples_per_gpu=2, repeat=3)
max_epochs = 12
