"""PointPillars on FULL Waymo (load_interval 1 vs D5's every-5th frame;
reference hv_pointpillars_secfpn_sbn_2x16_2x_waymo-3d-3class.py)."""
_base_ = ['./hv_pointpillars_secfpn_sbn_2x16_2x_waymoD5-3d-3class.py']
data = dict(load_interval=1)
