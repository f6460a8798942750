"""SECOND on Waymo-D5 (mirror of /root/reference/configs/second/
hv_second_secfpn_sbn_2x16_2x_waymoD5-3d-3class.py: 0.08 m voxels,
sparse shape [61, 1280, 1920], waymo vehicle/ped/cyclist anchors)."""
_base_ = [
    '../_base_/datasets/waymoD5-3d-3class.py',
    '../_base_/schedules/cyclic_20e.py',
    '../_base_/default_runtime.py',
]
model = dict(
    type='SECONDDetector',
    voxel_size=[0.08, 0.08, 0.1],
    point_cloud_range=[-76.8, -51.2, -2, 76.8, 51.2, 4],
    max_points_per_voxel=10,
    max_voxels=80000,
    sparse_shape=[61, 1280, 1920],
    encoder_budgets=[80000, 60000, 40000],
    encoder_out_budget=40000,
    head=dict(
        num_classes=3,
        anchor_sizes=[[4.73, 2.08, 1.77], [1.81, 0.84, 1.77],
                      [0.91, 0.84, 1.74]],
        anchor_ranges=[[-76.8, -51.2, 0, 76.8, 51.2, 0],
                       [-76.8, -51.2, 0, 76.8, 51.2, 0],
                       [-76.8, -51.2, 0, 76.8, 51.2, 0]],
        pos_iou_thr=[0.55, 0.5, 0.5], neg_iou_thr=[0.4, 0.3, 0.3],
        min_pos_iou=[0.4, 0.3, 0.3]),
)
max_epochs = 24
