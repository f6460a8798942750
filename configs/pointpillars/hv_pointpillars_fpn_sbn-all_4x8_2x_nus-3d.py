"""PointPillars + FPN neck on nuScenes (mirror of the reference
hv_pointpillars_fpn_sbn-all_4x8_2x_nus-3d.py)."""
_base_ = ['./hv_pointpillars_secfpn_sbn-all_4x8_2x_nus-3d.py']
model = dict(neck='fpn', neck_channels=[256, 256, 256])
