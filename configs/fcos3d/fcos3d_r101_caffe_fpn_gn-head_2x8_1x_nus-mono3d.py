"""FCOS3D on nuScenes monocular (mirror of /root/reference/configs/
fcos3d/fcos3d_r101_caffe_fpn_gn-head_dcn_2x8_1x_nus-mono3d.py).

FCOS3D is the depth-direct ancestor of PGD (the reference's PGDHead
subclasses FCOSMono3DHead); here it is the PGDDetector configured
without PGD's extras: no keypoint/bbox2d regression groups
(group_reg_dims (2, 1, 3, 1, 2) = offset, depth, size, rot, velocity),
single direct depth (depth_bins=2 minimum lanes, weight fixed), and the
nus 10-class monocular setup. DCN in the head is replaced by plain
convs (DCN's gather-heavy sampling does not map to the MXU; capacity
matched via the same channel widths)."""
_base_ = [
    '../_base_/datasets/nus-mono3d.py',
    '../_base_/schedules/schedule_3x.py',
    '../_base_/default_runtime.py',
]
model = dict(
    type='PGDDetector',
    backbone_depth=101,
    fpn_channels=256,
    fpn_start_level=1,
    fpn_num_outs=5,
    head=dict(
        num_classes=10,
        code_size=9,
        strides=[8, 16, 32, 64, 128],
        regress_ranges=[[-1, 48], [48, 96], [96, 192], [192, 384],
                        [384, 1e8]],
        group_reg_dims=[2, 1, 3, 1, 2],
        pred_velo=True,
        pred_keypoints=False,
        pred_bbox2d=False,
        reg_branch=[[256], [256], [256], [256], [256]],
        code_weight=[1.0, 1.0, 0.2, 1.0, 1.0, 1.0, 1.0, 0.05, 0.05],
        base_depths=[[28.01, 16.32]],
        base_dims=[[4.62, 1.73, 1.96], [6.93, 2.83, 2.51],
                   [12.56, 3.89, 2.94], [11.22, 3.50, 2.95],
                   [6.68, 3.21, 2.85], [6.68, 3.21, 2.85],
                   [2.11, 1.46, 0.78], [0.73, 1.77, 0.67],
                   [0.41, 1.08, 0.41], [0.50, 0.99, 2.52]],
        depth_range=[0, 70],
        weight_dim=1),
)
max_epochs = 12
