"""ImVoxelNet indoor on SUN-RGBD (mirror of /root/reference/configs/
imvoxelnet/imvoxelnet_4x2_sunrgbd-3d-10class.py: 40x40x16 voxel grid
over the [-3.2..3.2, -0.2..6.2, -2.28..0.28] m frustum,
IndoorImVoxelNeck, per-voxel ImVoxelHead with the FCAF3D
pts-threshold assignment)."""
_base_ = [
    '../_base_/datasets/sunrgbd-3d-10class.py',
    '../_base_/default_runtime.py',
]
model = dict(
    type='ImVoxelNetIndoor',
    n_voxels=[40, 40, 16],
    prior_range=[-3.2, -0.2, -2.28, 3.2, 6.2, 0.28],
    img_depth=50,
    fpn_channels=256,
    neck3d_channels=128,
    head=dict(
        n_classes=10,
        n_channels=128,
        pts_assign_threshold=27,
        pts_center_threshold=18,
        prior_range=[-3.2, -0.2, -2.28, 3.2, 6.2, 0.28],
        nms_pre=1000, iou_thr=0.25, score_thr=0.01,
    ),
)
optimizer = dict(lr=0.0001, weight_decay=0.0001, grad_clip=35.0,
                 lr_policy='step', lr_steps=(8, 11), lr_gamma=0.1)
data = dict(samples_per_gpu=2)
max_epochs = 12
