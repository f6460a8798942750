"""Mask R-CNN R101 1x on nuImages (mirror of
/root/reference/configs/nuimages/mask_rcnn_r101_fpn_1x_nuim.py)."""
_base_ = ['mask_rcnn_r50_fpn_1x_nuim.py']
model = dict(backbone_depth=101)
