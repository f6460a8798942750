"""Dynamic-voxelization SECOND, KITTI car (mirror of /root/reference/
configs/dynamic_voxelization/dv_second_secfpn_6x8_80e_kitti-3d-car.py)."""
_base_ = [
    '../_base_/models/hv_second_secfpn_kitti.py',
    '../_base_/datasets/kitti-3d-car.py',
    '../_base_/schedules/cyclic_40e.py',
    '../_base_/default_runtime.py',
]
model = dict(
    type='DVSECONDDetector',
    head=dict(
        num_classes=1,
        anchor_sizes=[[3.9, 1.6, 1.56]],
        anchor_ranges=[[0, -40, -1.78, 70.4, 40, -1.78]],
        pos_iou_thr=[0.6], neg_iou_thr=[0.45], min_pos_iou=[0.45]),
)
max_epochs = 80
