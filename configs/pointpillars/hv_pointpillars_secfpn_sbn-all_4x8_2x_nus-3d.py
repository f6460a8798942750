"""PointPillars SECFPN on nuScenes (mirror of /root/reference/configs/
pointpillars/hv_pointpillars_secfpn_sbn-all_4x8_2x_nus-3d.py; 10-class
shape-matched anchors, sync-BN subsumed by globally-reduced BN)."""
_base_ = [
    '../_base_/datasets/nus-3d.py',
    '../_base_/schedules/schedule_3x.py',
    '../_base_/default_runtime.py',
]
model = dict(
    type='PointPillars',
    voxel_size=[0.25, 0.25, 8],
    point_cloud_range=[-50, -50, -5, 50, 50, 3],
    max_points_per_voxel=64,
    max_voxels=30000,
    pfn_channels=[64],
    scatter_shape=[400, 400],
    backbone_channels=[64, 128, 256],
    backbone_layers=[3, 5, 5],
    backbone_strides=[2, 2, 2],
    neck_channels=[128, 128, 128],
    neck_strides=[1, 2, 4],
    head=dict(
        num_classes=10,
        feat_channels=384,
        anchor_sizes=[[1.68452161, 0.60058911, 1.27192197],
                      [2.09973778, 0.76279481, 1.44403034],
                      [0.72564370, 0.66344886, 1.75748069],
                      [0.40359262, 0.39694519, 1.06232151],
                      [0.48578221, 2.49008838, 0.98297065],
                      [4.60718145, 1.95017717, 1.72270761],
                      [6.73778078, 2.45609390, 2.73004906],
                      [12.01320693, 2.87427237, 3.81509561],
                      [11.1885991, 2.94046906, 3.47030982],
                      [6.38352896, 2.73050468, 3.13312415]],
        anchor_ranges=[[-50, -50, -1.8, 50, 50, -1.8]] * 10,
        pos_iou_thr=[0.6] * 10, neg_iou_thr=[0.3] * 10,
        min_pos_iou=[0.3] * 10),
)
max_epochs = 24
