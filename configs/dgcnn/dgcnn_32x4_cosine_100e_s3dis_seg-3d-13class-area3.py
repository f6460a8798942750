"""DGCNN S3DIS cross-validation fold: train on all areas but 3, test on
Area 3 (reference dgcnn_32x4_cosine_100e_s3dis_seg-3d-13class-area3
.py)."""
_base_ = ['./dgcnn_32x4_cosine_100e_s3dis_seg-3d-13class.py']
data = dict(
    train_info='s3dis_infos_not_Area_3.pkl',
    val_info='s3dis_infos_Area_3.pkl',
)
