"""ImVoxelNet KITTI car (mirror of
/root/reference/configs/imvoxelnet/imvoxelnet_4x8_kitti-3d-car.py:
monocular image lifted to a (216,248,12) voxel volume)."""
_base_ = [
    '../_base_/datasets/kitti-3d-car.py',
    '../_base_/default_runtime.py',
]
model = dict(
    type='ImVoxelNet',
    n_voxels=[216, 248, 12],
    point_cloud_range=[0, -39.68, -3.08, 69.12, 39.68, 0.76],
)
optimizer = dict(lr=0.0001, weight_decay=0.0001, grad_clip=35.0,
                 lr_policy='step', lr_steps=(8, 11), lr_gamma=0.1)
data = dict(samples_per_gpu=4)
max_epochs = 12
