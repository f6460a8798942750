"""FCAF3D ScanNet 18-class (mirror of
/root/reference/configs/fcaf3d/fcaf3d_8x2_scannet-3d-18class.py:
axis-aligned boxes -> with_yaw=False, n_reg_outs=6)."""
_base_ = [
    '../_base_/models/fcaf3d.py',
    '../_base_/datasets/scannet-3d-18class.py',
    '../_base_/default_runtime.py',
]
model = dict(head=dict(n_classes=18, n_reg_outs=6, with_yaw=False))
optimizer = dict(lr=0.001, weight_decay=0.0001, grad_clip=10.0,
                 lr_policy='step', lr_steps=(8, 11), lr_gamma=0.1)
data = dict(samples_per_gpu=2, repeat=10)
max_epochs = 12
