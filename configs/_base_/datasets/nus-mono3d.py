"""nuScenes monocular dataset block (mirror of
/root/reference/configs/_base_/datasets/nus-mono3d.py)."""
dataset_type = 'NuScenesMonoDataset'
data_root = 'data/nuscenes/'
class_names = ['car', 'truck', 'trailer', 'bus', 'construction_vehicle',
               'bicycle', 'motorcycle', 'pedestrian', 'traffic_cone',
               'barrier']
data = dict(
    samples_per_gpu=2,
    train_ann='nuscenes_infos_train_mono3d.coco.json',
    val_ann='nuscenes_infos_val_mono3d.coco.json',
    img_scale=(1600, 900),
    max_objs=128,
)
