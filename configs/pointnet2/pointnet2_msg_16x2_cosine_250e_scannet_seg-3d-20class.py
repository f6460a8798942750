"""PointNet++ MSG ScanNet segmentation (reference
pointnet2_msg_16x2_cosine_250e_scannet_seg-3d-20class.py: per-level
two-radius multi-scale grouping)."""
_base_ = ['./pointnet2_ssg_16x2_cosine_200e_scannet_seg-3d-20class.py']
model = dict(
    msg=True,
    fp_channels=[[256, 256], [256, 256], [256, 128], [128, 128, 128]],
)
max_epochs = 250
