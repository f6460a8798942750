"""FCAF3D ScanNet 18-class config (axis-aligned boxes, n_reg_outs=6).

Mirror of /root/reference/configs/fcaf3d/fcaf3d_8x2_scannet-3d-18class.py.
Consumed by tools/train_fcaf3d.py via FCAF3DModelConfig overrides.
"""
voxel_size = 0.01
n_classes = 18
with_yaw = False
n_reg_outs = 6
class_names = ('cabinet', 'bed', 'chair', 'sofa', 'table', 'door',
               'window', 'bookshelf', 'picture', 'counter', 'desk',
               'curtain', 'refrigerator', 'showercurtrain', 'toilet',
               'sink', 'bathtub', 'garbagebin')
data_root = 'data/scannet/'
