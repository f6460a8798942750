"""Speed-benchmark PartA2 (mirror of /root/reference/configs/benchmark/
hv_PartA2_secfpn_4x8_cyclic_80e_pcdet_kitti-3d-3class.py)."""
_base_ = [
    '../_base_/models/parta2.py',
    '../_base_/datasets/kitti-3d-3class.py',
    '../_base_/schedules/cyclic_40e.py',
    '../_base_/default_runtime.py',
]
lr = 0.003
max_epochs = 80
