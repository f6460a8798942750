"""CenterPoint-DCN at 0.075 voxels — DCNSeparateHead per task (see the
01voxel dcn config's docstring; deformable sampling via
gga_tpu/ops/deform.py)."""
_base_ = ['./centerpoint_0075voxel_second_secfpn_4x8_cyclic_20e_nus.py']
model = dict(dcn_head=True)
