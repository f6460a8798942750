"""PGD KITTI mono3d (mirror of
/root/reference/configs/pgd/pgd_r101_caffe_fpn_gn-head_3x4_4x_kitti-mono3d.py:
SGD lr 0.001, steps (32, 44), 48 epochs, grad clip 35)."""
_base_ = [
    '../_base_/models/pgd.py',
    '../_base_/datasets/kitti-mono3d.py',
    '../_base_/default_runtime.py',
]
optimizer = dict(lr=0.001, momentum=0.9, weight_decay=0.0001,
                 grad_clip=35.0, lr_policy='step', lr_steps=(32, 44),
                 lr_gamma=0.1, warmup_iters=500, warmup_ratio=1.0 / 3)
data = dict(samples_per_gpu=3)
max_epochs = 48
