"""Tiny GGA config for smoke tests / CI: coarse voxels, thin channels.
Inherits everything else from the full KITTI config."""
_base_ = ['gga_kitti.py']

voxel_size = [0.32, 0.3125, 0.1]
point_cloud_range = [0, -40, -3, 71.68, 40, 1]

model = dict(
    voxel_size=voxel_size,
    point_cloud_range=point_cloud_range,
    max_voxels=2048,
    sparse_shape=[41, 256, 224],
    encoder_channels=[[8, 8], [8, 8], [8, 8], [8]],
    encoder_paddings=[[0, 1], [0, 1], [0, [0, 1, 1]], [0]],
    encoder_budgets=[2048, 2048, 2048],
    encoder_out_budget=2048,
    encoder_out_channels=16,
    backbone_channels=[16, 32],
    backbone_layers=[1, 1],
    neck_channels=[16, 16],
    share_conv_channel=16,
)

head = dict(
    voxel_size=voxel_size,
    point_cloud_range=point_cloud_range,
    grid_size=[224, 256, 40],
    max_objs=32,
)

test_cfg = dict(max_per_task=32, post_max_size=32)

data = dict(
    samples_per_gpu=1,
    max_points=4096,
    max_cluster_pts=64,
    train_info='kitti_infos_trainval_GGA.pkl',
)

max_epochs = 2
log_interval = 1
