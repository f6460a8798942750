"""Speed-benchmark SECOND (mirror of /root/reference/configs/benchmark/
hv_second_secfpn_4x8_80e_pcdet_kitti-3d-3class.py: the pcdet-aligned
training recipe used for cross-framework throughput comparison; the
model is the stock SECOND with pcdet's onecycle-style schedule)."""
_base_ = [
    '../_base_/models/hv_second_secfpn_kitti.py',
    '../_base_/datasets/kitti-3d-3class.py',
    '../_base_/schedules/cyclic_40e.py',
    '../_base_/default_runtime.py',
]
lr = 0.003
max_epochs = 80
