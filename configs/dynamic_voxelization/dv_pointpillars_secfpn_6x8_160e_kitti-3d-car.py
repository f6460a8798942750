"""Dynamic-voxelization PointPillars (mirror of
/root/reference/configs/dynamic_voxelization/dv_pointpillars_secfpn_6x8_160e_kitti-3d-car.py)."""
_base_ = ['../pointpillars/hv_pointpillars_secfpn_6x8_160e_kitti-3d-car.py']
model = dict(type='DynamicVoxelNet')
