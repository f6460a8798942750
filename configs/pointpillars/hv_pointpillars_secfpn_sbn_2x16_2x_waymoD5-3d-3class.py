"""PointPillars Waymo-D5 (mirror of /root/reference/configs/
pointpillars/hv_pointpillars_secfpn_sbn_2x16_2x_waymoD5-3d-3class.py)."""
_base_ = [
    '../_base_/datasets/waymoD5-3d-3class.py',
    '../_base_/schedules/cyclic_20e.py',
    '../_base_/default_runtime.py',
]
model = dict(
    type='PointPillars',
    voxel_size=[0.32, 0.32, 6],
    point_cloud_range=[-74.88, -74.88, -2, 74.88, 74.88, 4],
    max_points_per_voxel=20,
    max_voxels=32000,
    pfn_channels=[64],
    scatter_shape=[468, 468],
    backbone_channels=[64, 128, 256],
    backbone_layers=[3, 5, 5],
    backbone_strides=[1, 2, 2],
    neck_channels=[128, 128, 128],
    neck_strides=[1, 2, 4],
    head=dict(
        num_classes=3,
        anchor_sizes=[[4.73, 2.08, 1.77], [1.81, 0.84, 1.77],
                      [0.91, 0.84, 1.74]],
        anchor_ranges=[[-74.88, -74.88, -0.0345, 74.88, 74.88, -0.0345],
                       [-74.88, -74.88, -0.1188, 74.88, 74.88, -0.1188],
                       [-74.88, -74.88, 0, 74.88, 74.88, 0]],
        pos_iou_thr=[0.55, 0.5, 0.5], neg_iou_thr=[0.4, 0.3, 0.3],
        min_pos_iou=[0.4, 0.3, 0.3]),
)
max_epochs = 24
