"""S3DIS semantic-seg dataset block (mirror of
/root/reference/configs/_base_/datasets/s3dis_seg-3d-13class.py)."""
dataset_type = 'S3DISSegDataset'
data_root = 'data/s3dis/'
class_names = ('ceiling', 'floor', 'wall', 'beam', 'column', 'window',
               'door', 'table', 'chair', 'sofa', 'bookcase', 'board',
               'clutter')
data = dict(
    samples_per_gpu=8,
    train_info='s3dis_infos_Area_1.pkl',
    val_info='s3dis_infos_Area_5.pkl',
    num_points=4096,
)
