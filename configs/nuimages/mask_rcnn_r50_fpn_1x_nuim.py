"""Mask R-CNN R50 1x on nuImages (mirror of
/root/reference/configs/nuimages/mask_rcnn_r50_fpn_1x_nuim.py)."""
_base_ = [
    '../_base_/models/mask_rcnn_r50_fpn.py',
    '../_base_/datasets/nuim_instance.py',
    '../_base_/schedules/mmdet_schedule_1x.py',
    '../_base_/default_runtime.py',
]
model = dict(num_classes=10)
