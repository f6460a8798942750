"""Mask R-CNN R50-FPN model block (mirror of
/root/reference/configs/_base_/models/mask_rcnn_r50_fpn.py; the
assigner/sampler/NMS hyperparameters live as MaskRCNNConfig fields)."""
model = dict(
    type='MaskRCNN',
    num_classes=80,
    backbone_depth=50,
    fpn_channels=256,
    strides=[4, 8, 16, 32, 64],
    anchor_scale=8.0,
    anchor_ratios=[0.5, 1.0, 2.0],
    rpn_nms_thr=0.7,
    rpn_pos_iou=0.7,
    rpn_neg_iou=0.3,
    pos_iou_thr=0.5,
    neg_iou_thr=0.5,
    pos_fraction=0.25,
    target_stds=[0.1, 0.1, 0.2, 0.2],
    roi_size=7,
    mask_roi_size=14,
    mask_size=28,
    fc_channels=1024,
    mask_convs=4,
    score_thr=0.05,
    test_nms_thr=0.5,
    max_per_img=100,
)
