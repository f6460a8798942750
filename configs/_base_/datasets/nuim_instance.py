"""nuImages 2D instance-segmentation dataset block (mirror of
/root/reference/configs/_base_/datasets/nuim_instance.py).

Static-shape deltas: images are resized-with-ratio then padded to the
fixed (padded_h, padded_w) canvas instead of size_divisor=32 with
dynamic extents; annotations are padded to max_objs slots."""
dataset_type = 'NuImagesInstanceDataset'
data_root = 'data/nuimages/'
class_names = [
    'car', 'truck', 'trailer', 'bus', 'construction_vehicle', 'bicycle',
    'motorcycle', 'pedestrian', 'traffic_cone', 'barrier'
]
img_norm_cfg = dict(
    mean=[123.675, 116.28, 103.53], std=[58.395, 57.12, 57.375],
    to_rgb=True)
data = dict(
    samples_per_gpu=2,
    train=dict(
        type=dataset_type,
        data_root=data_root,
        ann_file=data_root + 'annotations/nuimages_v1.0-train.json',
        img_scale=(1600, 896),
        max_objs=128,
        flip_ratio=0.5,
        img_norm=img_norm_cfg,
        classes=class_names),
    val=dict(
        type=dataset_type,
        data_root=data_root,
        ann_file=data_root + 'annotations/nuimages_v1.0-val.json',
        img_scale=(1600, 896),
        max_objs=128,
        flip_ratio=0.0,
        img_norm=img_norm_cfg,
        classes=class_names),
)
