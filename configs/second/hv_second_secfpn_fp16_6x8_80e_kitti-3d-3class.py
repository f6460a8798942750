"""fp16 SECOND (bf16 compute on TPU; reference
hv_second_secfpn_fp16_6x8_80e_kitti-3d-3class.py)."""
_base_ = ['./hv_second_secfpn_6x8_80e_kitti-3d-3class.py']
model = dict(compute_dtype='bfloat16')
