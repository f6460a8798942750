"""SUN RGB-D 10-class dataset block (mirror of
/root/reference/configs/_base_/datasets/sunrgbd-3d-10class.py)."""
dataset_type = 'SunRgbdDataset'
data_root = 'data/sunrgbd/'
class_names = ('bed', 'table', 'sofa', 'chair', 'toilet', 'desk',
               'dresser', 'night_stand', 'bookshelf', 'bathtub')
data = dict(
    samples_per_gpu=16,
    train_info='sunrgbd_infos_train.pkl',
    val_info='sunrgbd_infos_val.pkl',
    num_points=20000,
    repeat=3,
)
