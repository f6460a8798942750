"""PointPillars Lyft (mirror of /root/reference/configs/pointpillars/
hv_pointpillars_secfpn_sbn-all_2x8_2x_lyft-3d.py; sync-BN is subsumed
by the globally-reduced batch norm under pjit)."""
_base_ = [
    '../_base_/datasets/lyft-3d.py',
    '../_base_/schedules/cyclic_20e.py',
    '../_base_/default_runtime.py',
]
model = dict(
    type='PointPillars',
    voxel_size=[0.25, 0.25, 8],
    point_cloud_range=[-80, -80, -5, 80, 80, 3],
    max_points_per_voxel=20,
    max_voxels=60000,
    pfn_channels=[64],
    scatter_shape=[640, 640],
    backbone_channels=[64, 128, 256],
    backbone_layers=[3, 5, 5],
    backbone_strides=[2, 2, 2],
    neck_channels=[128, 128, 128],
    neck_strides=[1, 2, 4],
    head=dict(
        num_classes=9,
        feat_channels=384,
        anchor_sizes=[[4.75, 1.92, 1.71], [10.24, 2.84, 3.44],
                      [12.70, 2.92, 3.42], [6.52, 2.42, 2.34],
                      [8.17, 2.75, 3.20], [2.35, 0.96, 1.59],
                      [1.76, 0.63, 1.44], [0.80, 0.76, 1.76],
                      [0.73, 0.35, 0.50]],
        anchor_ranges=[[-80, -80, -1.07, 80, 80, -1.07]] * 9,
        pos_iou_thr=[0.6] * 9, neg_iou_thr=[0.45] * 9,
        min_pos_iou=[0.45] * 9),
)
max_epochs = 24
