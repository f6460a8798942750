"""Waymo (kitti-format, 1/5 subsample) dataset block (mirror of
/root/reference/configs/_base_/datasets/waymoD5-3d-3class.py)."""
dataset_type = 'WaymoDataset'
data_root = 'data/waymo/kitti_format/'
class_names = ['Car', 'Cyclist', 'Pedestrian']
point_cloud_range = [-74.88, -74.88, -2, 74.88, 74.88, 4]
data = dict(
    samples_per_gpu=2,
    train_info='waymo_infos_train.pkl',
    val_info='waymo_infos_val.pkl',
    pts_prefix='velodyne',
    max_points=180000,
    max_objs=128,
)
