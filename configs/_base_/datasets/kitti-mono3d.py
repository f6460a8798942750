"""KITTI monocular dataset block (mirror of
/root/reference/configs/_base_/datasets/kitti-mono3d.py)."""
dataset_type = 'KittiMonoDataset'
data_root = 'data/kitti/'
class_names = ['Pedestrian', 'Cyclist', 'Car']
data = dict(
    samples_per_gpu=4,
    train_ann='kitti_infos_train_mono3d.coco.json',
    val_ann='kitti_infos_val_mono3d.coco.json',
    img_shape=(384, 1248),
    max_objs=64,
)
