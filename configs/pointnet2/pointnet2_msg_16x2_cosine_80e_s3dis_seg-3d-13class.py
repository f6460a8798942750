"""PointNet++ MSG S3DIS segmentation (reference
pointnet2_msg_16x2_cosine_80e_s3dis_seg-3d-13class.py)."""
_base_ = ['./pointnet2_ssg_16x2_cosine_50e_s3dis_seg-3d-13class.py']
model = dict(
    msg=True,
    in_channels=9,
    fp_channels=[[256, 256], [256, 256], [256, 128], [128, 128, 128]],
)
max_epochs = 80
