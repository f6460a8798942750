"""GGA weak-training config for KITTI.

Behavioral mirror of /root/reference/configs/gga/gga_kitti_config.py
(voxel/grid geometry :1-19, model :5-91, schedule :233-248) expressed as a
plain python config for gga_tpu.
"""

voxel_size = [0.05, 0.05, 0.1]
point_cloud_range = [0, -40, -3, 70.4, 40, 1]
class_names = ['Pedestrian', 'Cyclist', 'Car']

data_root = 'data/kitti/'

model = dict(
    type='GGADetector',
    voxel_size=voxel_size,
    point_cloud_range=point_cloud_range,
    max_points_per_voxel=5,
    max_voxels=16000,
    sparse_shape=[41, 1600, 1408],
    encoder_channels=[[16, 16, 32], [32, 32, 64], [64, 64, 128],
                      [128, 128]],
    encoder_paddings=[[0, 0, 1], [0, 0, 1], [0, 0, [0, 1, 1]], [0, 0]],
    encoder_budgets=[16000, 14000, 12000],
    encoder_out_budget=12000,
    encoder_out_channels=128,
    backbone_channels=[128, 256],
    backbone_layers=[5, 5],
    backbone_strides=[1, 2],
    neck_channels=[256, 256],
    neck_strides=[1, 2],
    tasks=[1, 1, 1],
    share_conv_channel=64,
)

head = dict(
    voxel_size=voxel_size,
    point_cloud_range=point_cloud_range,
    grid_size=[1408, 1600, 40],
    out_size_factor=8,
    max_objs=128,            # static pad; KITTI scenes stay well below
    gaussian_overlap=0.1,
    min_radius=2,
    code_weights=[0.5, 0.5, 0.5, 0.5, 0.5],
    srl_priors=[[1.35, 0.48], [3.60, 0.68], [2.40, 0.28]],
    loss_heatmap_weight=5.0,
    loss_bpl_weight=0.3,
    loss_srl_weight=0.1,
    loss_pal_weight=0.1,
    pal_in_total_loss=False,  # reference _parse_losses quirk
)

test_cfg = dict(
    max_per_task=100,
    score_threshold=0.1,
    nms_thr=0.2,
    post_max_size=512,
)

data = dict(
    samples_per_gpu=8,       # per-chip batch (ref: 32/GPU on V100)
    train_info='kitti_infos_trainval_GGA.pkl',
    db_info='kitti_dbinfos_train_GGA.pkl',
    pts_prefix='velodyne_reduced',
    max_points=24000,
    max_cluster_pts=256,
    num_points_range=15,
    min_distance=5.0,
    db_sampler=dict(
        rate=1.0,
        prepare=dict(
            filter_by_difficulty=[-1],
            filter_by_min_points=dict(Car=5, Pedestrian=10, Cyclist=10)),
        sample_groups=dict(Car=12, Pedestrian=10, Cyclist=10)),
)

optimizer = dict(
    lr=0.0015, betas=(0.95, 0.99), weight_decay=0.01, grad_clip=35.0,
    lr_target_ratio=(10, 1e-4),
    momentum_target_ratio=(0.8947368421052632, 1.0),
    step_ratio_up=0.4)

max_epochs = 120
checkpoint_interval = 1     # epochs
log_interval = 50           # steps
eval_interval = 5           # epochs
work_dir = './work_dirs/kitti_GGA'
seed = 0
