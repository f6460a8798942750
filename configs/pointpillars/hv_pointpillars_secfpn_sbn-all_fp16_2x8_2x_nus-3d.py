"""fp16 nus PointPillars — on TPU the mixed-precision equivalent is a
bfloat16 compute path (params and losses stay f32), mirroring
hv_pointpillars_secfpn_sbn-all_fp16_2x8_2x_nus-3d.py."""
_base_ = ['./hv_pointpillars_secfpn_sbn-all_4x8_2x_nus-3d.py']
model = dict(compute_dtype='bfloat16')
