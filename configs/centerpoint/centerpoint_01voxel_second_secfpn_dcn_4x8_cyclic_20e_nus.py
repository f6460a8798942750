"""CenterPoint-DCN (counterpart of /root/reference/configs/centerpoint/
centerpoint_01voxel_second_secfpn_dcn_4x8_cyclic_20e_nus.py, whose head
is DCNSeparateHead — centerpoint_head.py:125).

The deformable feature adaptation is the real thing here too: per-pixel
learned offsets with bilinear sampling (gga_tpu/ops/deform.py), resolved
as four flat row gathers + one MXU einsum instead of mmcv's CUDA im2col.
"""
_base_ = ['./centerpoint_01voxel_second_secfpn_4x8_cyclic_20e_nus.py']
model = dict(dcn_head=True)
