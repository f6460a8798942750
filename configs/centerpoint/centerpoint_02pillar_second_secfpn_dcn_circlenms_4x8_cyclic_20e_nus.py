"""Pillar DCN substitute + circle-NMS (reference
..._dcn_circlenms_4x8_cyclic_20e_nus.py)."""
_base_ = ['./centerpoint_02pillar_second_secfpn_dcn_4x8_cyclic_20e_nus.py']
model = dict(nms_type='circle')
