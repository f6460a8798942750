"""RegNet-400MF PointPillars + FPN on Lyft (reference
hv_pointpillars_regnet-400mf_fpn_sbn-all_2x8_2x_lyft-3d.py)."""
_base_ = ['./hv_pointpillars_regnet-400mf_secfpn_sbn-all_2x8_2x_lyft-3d.py']
model = dict(neck='fpn', neck_channels=[256, 256, 256])
