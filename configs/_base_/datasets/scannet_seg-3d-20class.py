"""ScanNet 20-class semantic-seg dataset block (mirror of
/root/reference/configs/_base_/datasets/scannet_seg-3d-20class.py)."""
dataset_type = 'ScanNetSegDataset'
data_root = 'data/scannet/'
class_names = ('wall', 'floor', 'cabinet', 'bed', 'chair', 'sofa',
               'table', 'door', 'window', 'bookshelf', 'picture',
               'counter', 'desk', 'curtain', 'refrigerator',
               'showercurtrain', 'toilet', 'sink', 'bathtub',
               'otherfurniture')
data = dict(
    samples_per_gpu=8,
    train_info='scannet_infos_train.pkl',
    val_info='scannet_infos_val.pkl',
    num_points=8192,
)
