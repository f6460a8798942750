"""PointNet++ SSG ScanNet segmentation (mirror of /root/reference/
configs/pointnet2/pointnet2_ssg_16x2_cosine_200e_scannet_seg-3d-20class
.py; ignore_index 20 = unannotated points)."""
_base_ = [
    '../_base_/datasets/scannet_seg-3d-20class.py',
    '../_base_/default_runtime.py',
]
model = dict(
    type='EncoderDecoder3D',
    num_classes=20,
    in_channels=6,
)
optimizer = dict(lr=0.001, weight_decay=0.01, grad_clip=10.0,
                 lr_policy='cosine', min_lr_ratio=1e-3)
data = dict(samples_per_gpu=16)
max_epochs = 200
