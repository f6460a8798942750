"""Mirror of the reference circlenms variant (test_cfg nms_type='circle',
box3d_nms.circle_nms)."""
_base_ = ['./centerpoint_0075voxel_second_secfpn_4x8_cyclic_20e_nus.py']
model = dict(nms_type='circle')
