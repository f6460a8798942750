"""KITTI 3-class LiDAR dataset block (mirror of
/root/reference/configs/_base_/datasets/kitti-3d-3class.py)."""
dataset_type = 'KittiDataset'
data_root = 'data/kitti/'
class_names = ['Pedestrian', 'Cyclist', 'Car']
point_cloud_range = [0, -40, -3, 70.4, 40, 1]
data = dict(
    samples_per_gpu=6,
    train_info='kitti_infos_train.pkl',
    val_info='kitti_infos_val.pkl',
    pts_prefix='velodyne_reduced',
    max_points=24000,
    db_info='kitti_dbinfos_train.pkl',
    db_sampler=dict(
        rate=1.0,
        prepare=dict(
            filter_by_difficulty=[-1],
            filter_by_min_points=dict(Car=5, Pedestrian=10, Cyclist=10)),
        sample_groups=dict(Car=12, Pedestrian=6, Cyclist=6)),
)
