"""FCAF3D S3DIS 5-class detection (reference
fcaf3d_8x2_s3dis-3d-5class.py: table/chair/sofa/bookcase/board)."""
_base_ = ['./fcaf3d_8x2_scannet-3d-18class.py']
model = dict(head=dict(n_classes=5))
dataset_type = 'S3DISDataset'
data_root = 'data/s3dis/'
class_names = ('table', 'chair', 'sofa', 'bookcase', 'board')
data = dict(
    train_info='s3dis_infos_Area_1.pkl',
    val_info='s3dis_infos_Area_5.pkl',
)
