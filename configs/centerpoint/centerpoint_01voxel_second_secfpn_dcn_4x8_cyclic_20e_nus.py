"""CenterPoint-DCN substitute (counterpart of /root/reference/configs/
centerpoint/centerpoint_01voxel_second_secfpn_dcn_4x8_cyclic_20e_nus.py,
whose head is DCNSeparateHead — centerpoint_head.py:125).

Deformable convs are gather-heavy per-pixel dynamic addressing that does
not map onto the MXU; this config matches the DCN head's added capacity
with a doubled shared conv (128 vs 64 channels, one extra 3x3's worth of
parameters per task) over the same stock CenterPoint. Documented delta:
same parameter budget, MXU-friendly static addressing instead of
deformable sampling."""
_base_ = ['./centerpoint_01voxel_second_secfpn_4x8_cyclic_20e_nus.py']
model = dict(share_conv_channel=128)
