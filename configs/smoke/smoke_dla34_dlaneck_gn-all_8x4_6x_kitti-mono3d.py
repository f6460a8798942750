"""SMOKE KITTI mono3d (mirror of
/root/reference/configs/smoke/smoke_dla34_pytorch_dlaneck_gn-all_8x4_6x_kitti-mono3d.py:
DLA-34 gn-all + DLANeck, Adam lr 2.5e-4, step 50 of 72 epochs)."""
_base_ = [
    '../_base_/models/smoke.py',
    '../_base_/datasets/kitti-mono3d.py',
    '../_base_/default_runtime.py',
]
optimizer = dict(lr=0.00025, grad_clip=0.0,
                 lr_policy='step', lr_steps=(50,), lr_gamma=0.1)
data = dict(samples_per_gpu=8)
max_epochs = 72
