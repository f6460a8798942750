"""PGD on nuScenes monocular, 1x schedule (mirror of /root/reference/
configs/pgd/pgd_r101_caffe_fpn_gn-head_2x16_1x_nus-mono3d.py: 10-class,
code_size 9 with velocity group, bbox2d on, per-class base depths/dims,
velocity code weight 0.05, bbox2d 0.2)."""
_base_ = [
    '../_base_/models/pgd.py',
    '../_base_/datasets/nus-mono3d.py',
    '../_base_/default_runtime.py',
]
model = dict(
    backbone_depth=101,
    head=dict(
        num_classes=10,
        code_size=9,
        group_reg_dims=[2, 1, 3, 1, 2, 4],
        reg_branch=[[256], [256], [256], [256], [], [256]],
        pred_velo=True,
        pred_keypoints=False,
        pred_bbox2d=True,
        code_weight=[1.0, 1.0, 0.2, 1.0, 1.0, 1.0, 1.0, 0.05, 0.05,
                     0.2, 0.2, 0.2, 0.2],
        base_depths=[[31.99, 21.12], [37.15, 24.63], [39.69, 23.97],
                     [40.91, 26.34], [34.16, 20.11], [22.35, 13.70],
                     [24.28, 16.05], [27.26, 15.50], [20.61, 13.68],
                     [22.74, 15.01]],
        base_dims=[[4.62, 1.73, 1.96], [6.93, 2.83, 2.51],
                   [12.56, 3.89, 2.94], [11.22, 3.50, 2.95],
                   [6.68, 3.21, 2.85], [6.68, 3.21, 2.85],
                   [2.11, 1.46, 0.78], [0.73, 1.77, 0.67],
                   [0.41, 1.08, 0.41], [0.50, 0.99, 2.52]],
        nms_pre=1000, nms_thr=0.8, score_thr=0.01, max_per_img=200,
    ),
)
optimizer = dict(lr=0.004, grad_clip=35.0, warmup_iters=500,
                 warmup_ratio=1.0 / 3, lr_policy='step',
                 lr_steps=(8, 11), lr_gamma=0.1)
data = dict(samples_per_gpu=2)
max_epochs = 12
