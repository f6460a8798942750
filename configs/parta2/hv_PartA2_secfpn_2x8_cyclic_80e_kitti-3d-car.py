"""Part-A2 car-only (reference
hv_PartA2_secfpn_2x8_cyclic_80e_kitti-3d-car.py)."""
_base_ = ['./hv_PartA2_secfpn_2x8_cyclic_80e_kitti-3d-3class.py']
model = dict(rpn=dict(
    num_classes=1,
    anchor_sizes=[[3.9, 1.6, 1.56]],
    anchor_ranges=[[0, -40, -1.78, 70.4, 40, -1.78]],
    pos_iou_thr=[0.6], neg_iou_thr=[0.45], min_pos_iou=[0.45]))
