"""Pillar CenterPoint-DCN: DCNSeparateHead per task (see the 01voxel dcn
config)."""
_base_ = ['./centerpoint_02pillar_second_secfpn_4x8_cyclic_20e_nus.py']
model = dict(dcn_head=True)
