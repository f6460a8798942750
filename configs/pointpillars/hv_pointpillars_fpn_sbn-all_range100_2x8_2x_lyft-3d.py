"""Lyft 100 m range + FPN (reference
hv_pointpillars_fpn_sbn-all_range100_2x8_2x_lyft-3d.py)."""
_base_ = ['./hv_pointpillars_secfpn_sbn-all_range100_2x8_2x_lyft-3d.py']
model = dict(neck='fpn', neck_channels=[256, 256, 256])
