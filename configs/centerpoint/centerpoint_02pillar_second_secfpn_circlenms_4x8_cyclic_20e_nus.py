"""Pillar + circle-NMS (reference ..._circlenms_4x8_cyclic_20e_nus.py)."""
_base_ = ['./centerpoint_02pillar_second_secfpn_4x8_cyclic_20e_nus.py']
model = dict(nms_type='circle')
