"""Speed-benchmark PointPillars car-only (mirror of /root/reference/
configs/benchmark/hv_pointpillars_secfpn_3x8_100e_det3d_kitti-3d-car.py:
det3d-aligned recipe)."""
_base_ = [
    '../_base_/models/hv_pointpillars_secfpn_kitti.py',
    '../_base_/datasets/kitti-3d-car.py',
    '../_base_/schedules/cyclic_40e.py',
    '../_base_/default_runtime.py',
]
model = dict(
    head=dict(
        num_classes=1,
        anchor_sizes=[[3.9, 1.6, 1.56]],
        anchor_ranges=[[0, -39.68, -1.78, 69.12, 39.68, -1.78]],
        pos_iou_thr=[0.6], neg_iou_thr=[0.45], min_pos_iou=[0.45]),
)
max_epochs = 100
