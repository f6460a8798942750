"""PointRCNN model base (mirror of
/root/reference/configs/_base_/models/point_rcnn.py: PointNet2SAMSG
4-level MSG backbone without aggregation convs, FP neck back to full
resolution, point RPN + RoI point pooling refinement; the detailed knobs
live as PointRCNNConfig dataclass defaults)."""
model = dict(
    type='PointRCNNDetector',
    num_points=[4096, 1024, 256, 64],
    rpn=dict(num_classes=3,
             mean_sizes=[[3.9, 1.6, 1.56], [0.8, 0.6, 1.73],
                         [1.76, 0.6, 1.73]]),
    roi=dict(num_rois=128, pos_fraction=0.5, pos_iou_thr=0.55,
             hard_neg_iou_thr=0.1, hard_neg_fraction=0.8,
             roi_pts_budget=512),
)
