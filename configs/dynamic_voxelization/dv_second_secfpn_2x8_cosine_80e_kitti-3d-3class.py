"""Dynamic-voxelization SECOND 3-class, cosine schedule (mirror of
dv_second_secfpn_2x8_cosine_80e_kitti-3d-3class.py)."""
_base_ = [
    '../_base_/models/hv_second_secfpn_kitti.py',
    '../_base_/datasets/kitti-3d-3class.py',
    '../_base_/schedules/cosine.py',
    '../_base_/default_runtime.py',
]
model = dict(type='DVSECONDDetector')
max_epochs = 80
