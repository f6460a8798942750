"""SECOND 3-class KITTI (mirror of
/root/reference/configs/second/hv_second_secfpn_6x8_80e_kitti-3d-3class.py:
cyclic_40e schedule x2 repeats = 80 effective epochs)."""
_base_ = [
    '../_base_/models/hv_second_secfpn_kitti.py',
    '../_base_/datasets/kitti-3d-3class.py',
    '../_base_/schedules/cyclic_40e.py',
    '../_base_/default_runtime.py',
]
max_epochs = 80
