"""Lyft 3D dataset block (mirror of
/root/reference/configs/_base_/datasets/lyft-3d.py)."""
dataset_type = 'LyftDataset'
data_root = 'data/lyft/'
class_names = ['car', 'truck', 'bus', 'emergency_vehicle',
               'other_vehicle', 'motorcycle', 'bicycle', 'pedestrian',
               'animal']
point_cloud_range = [-80, -80, -5, 80, 80, 3]
data = dict(
    samples_per_gpu=2,
    train_info='lyft_infos_train.pkl',
    val_info='lyft_infos_val.pkl',
    max_points=80000,
    max_objs=128,
    sweeps_num=10,
    with_velocity=False,
)
