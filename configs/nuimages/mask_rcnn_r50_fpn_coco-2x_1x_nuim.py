"""Mask R-CNN R50 1x on nuImages from COCO-2x weights (mirror of
/root/reference/configs/nuimages/mask_rcnn_r50_fpn_coco-2x_1x_nuim.py;
the COCO init arrives via load_from at the checkpoint level)."""
_base_ = ['mask_rcnn_r50_fpn_1x_nuim.py']
load_from = 'checkpoints/mask_rcnn_r50_fpn_coco_2x.pkl'
