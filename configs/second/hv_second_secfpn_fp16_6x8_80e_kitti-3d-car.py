"""fp16 SECOND car-only (bf16 compute on TPU; reference
hv_second_secfpn_fp16_6x8_80e_kitti-3d-car.py)."""
_base_ = ['./hv_second_secfpn_6x8_80e_kitti-3d-car.py']
model = dict(compute_dtype='bfloat16')
