"""DCN-substitute + circle-NMS at 0.075 voxels (reference
centerpoint_0075voxel_second_secfpn_dcn_circlenms_4x8_cyclic_20e_nus.py)."""
_base_ = ['./centerpoint_0075voxel_second_secfpn_dcn_4x8_cyclic_20e_nus.py']
model = dict(nms_type='circle')
