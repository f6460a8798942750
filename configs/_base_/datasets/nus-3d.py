"""nuScenes 10-class LiDAR dataset block (mirror of
/root/reference/configs/_base_/datasets/nus-3d.py)."""
dataset_type = 'NuScenesDataset'
data_root = 'data/nuscenes/'
class_names = ['car', 'truck', 'trailer', 'bus', 'construction_vehicle',
               'bicycle', 'motorcycle', 'pedestrian', 'traffic_cone',
               'barrier']
point_cloud_range = [-50, -50, -5, 50, 50, 3]
data = dict(
    samples_per_gpu=4,
    train_info='nuscenes_infos_train.pkl',
    val_info='nuscenes_infos_val.pkl',
    max_points=60000,
    max_objs=128,
    sweeps_num=10,
    load_interval=1,
    with_velocity=True,
)
