"""PAConv SSG S3DIS segmentation (mirror of /root/reference/configs/
paconv/paconv_ssg_8x8_cosine_150e_s3dis_seg-3d-13class.py; train adds
the kernel-correlation regularizer, paconv.paconv_regularization_loss,
weight 1.0)."""
_base_ = [
    '../_base_/datasets/s3dis_seg-3d-13class.py',
    '../_base_/default_runtime.py',
]
model = dict(
    type='PAConvSegmentor',
    in_channels=9,
    num_classes=13,
    num_kernels=8,
)
optimizer = dict(lr=0.01, weight_decay=0.0001, grad_clip=10.0,
                 lr_policy='cosine', min_lr_ratio=1e-4)
max_epochs = 150
