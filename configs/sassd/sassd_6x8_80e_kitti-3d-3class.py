"""SA-SSD 3-class KITTI (mirror of
/root/reference/configs/sassd/sassd_6x8_80e_kitti-3d-3class.py: SECOND
stack + point-wise auxiliary branch)."""
_base_ = [
    '../_base_/models/hv_second_secfpn_kitti.py',
    '../_base_/datasets/kitti-3d-3class.py',
    '../_base_/schedules/cyclic_40e.py',
    '../_base_/default_runtime.py',
]
model = dict(type='SASSD', aux_channels=64)
max_epochs = 80
