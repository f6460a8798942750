"""Circle-NMS variant at 0.1 voxels (reference
centerpoint_01voxel_second_secfpn_circlenms_4x8_cyclic_20e_nus.py)."""
_base_ = ['./centerpoint_01voxel_second_secfpn_4x8_cyclic_20e_nus.py']
model = dict(nms_type='circle')
