"""PointNet++ SSG S3DIS segmentation (mirror of /root/reference/configs/
pointnet2/pointnet2_ssg_16x2_cosine_50e_s3dis_seg-3d-13class.py)."""
_base_ = [
    '../_base_/datasets/s3dis_seg-3d-13class.py',
    '../_base_/default_runtime.py',
]
model = dict(
    type='EncoderDecoder3D',
    num_classes=13,
    in_channels=6,
)
optimizer = dict(lr=0.001, weight_decay=0.001, grad_clip=10.0,
                 lr_policy='cosine', min_lr_ratio=1e-3)
max_epochs = 50
