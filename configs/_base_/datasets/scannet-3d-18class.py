"""ScanNet 18-class dataset block (mirror of
/root/reference/configs/_base_/datasets/scannet-3d-18class.py)."""
dataset_type = 'ScannetDataset'
data_root = 'data/scannet/'
class_names = ('cabinet', 'bed', 'chair', 'sofa', 'table', 'door',
               'window', 'bookshelf', 'picture', 'counter', 'desk',
               'curtain', 'refrigerator', 'showercurtrain', 'toilet',
               'sink', 'bathtub', 'garbagebin')
data = dict(
    samples_per_gpu=8,
    train_info='scannet_infos_train.pkl',
    val_info='scannet_infos_val.pkl',
    num_points=40000,
    repeat=5,
)
