"""PointPillars Waymo-D5 car-only (reference
hv_pointpillars_secfpn_sbn_2x16_2x_waymoD5-3d-car.py)."""
_base_ = ['./hv_pointpillars_secfpn_sbn_2x16_2x_waymoD5-3d-3class.py']
model = dict(head=dict(
    num_classes=1,
    anchor_sizes=[[4.73, 2.08, 1.77]],
    anchor_ranges=[[-74.88, -74.88, -0.0345, 74.88, 74.88, -0.0345]],
    pos_iou_thr=[0.55], neg_iou_thr=[0.4], min_pos_iou=[0.4]))
