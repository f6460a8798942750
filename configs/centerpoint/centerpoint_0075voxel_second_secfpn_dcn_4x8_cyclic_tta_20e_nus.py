"""Scale+flip TTA variant (reference ..._dcn_4x8_cyclic_tta_20e_nus:
pcd_scale_factor 0.95/1.0/1.05 x double flip)."""
_base_ = ['./centerpoint_0075voxel_second_secfpn_dcn_4x8_cyclic_20e_nus.py']
tta = dict(flip=True, scales=[0.95, 1.0, 1.05])
