"""PointPillars 3-class KITTI (mirror of
/root/reference/configs/pointpillars/hv_pointpillars_secfpn_6x8_160e_kitti-3d-3class.py)."""
_base_ = [
    '../_base_/models/hv_pointpillars_secfpn_kitti.py',
    '../_base_/datasets/kitti-3d-3class.py',
    '../_base_/schedules/cyclic_40e.py',
    '../_base_/default_runtime.py',
]
optimizer = dict(lr=0.001)
max_epochs = 160
