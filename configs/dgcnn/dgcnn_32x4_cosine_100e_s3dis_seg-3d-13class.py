"""DGCNN S3DIS segmentation (mirror of /root/reference/configs/dgcnn/
dgcnn_32x4_cosine_100e_s3dis_seg-3d-13class.py)."""
_base_ = [
    '../_base_/datasets/s3dis_seg-3d-13class.py',
    '../_base_/default_runtime.py',
]
model = dict(
    type='DGCNNSegmentor',
    in_channels=9,
    num_classes=13,
)
optimizer = dict(lr=0.1, weight_decay=0.0001, grad_clip=10.0,
                 lr_policy='cosine', min_lr_ratio=1e-3)
data = dict(samples_per_gpu=32)
max_epochs = 100
