"""PointPillars full-Waymo car-only (reference
hv_pointpillars_secfpn_sbn_2x16_2x_waymo-3d-car.py)."""
_base_ = ['./hv_pointpillars_secfpn_sbn_2x16_2x_waymoD5-3d-car.py']
data = dict(load_interval=1)
