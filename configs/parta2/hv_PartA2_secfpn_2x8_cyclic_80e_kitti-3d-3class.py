"""Part-A2 3-class KITTI (mirror of
/root/reference/configs/parta2/hv_PartA2_secfpn_2x8_cyclic_80e_kitti-3d-3class.py)."""
_base_ = [
    '../_base_/models/parta2.py',
    '../_base_/datasets/kitti-3d-3class.py',
    '../_base_/schedules/cyclic_40e.py',
    '../_base_/default_runtime.py',
]
optimizer = dict(lr=0.001)
data = dict(samples_per_gpu=2)
max_epochs = 80
