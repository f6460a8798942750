"""fp16 (bf16-on-TPU) RegNet-400MF FPN nus (reference
hv_pointpillars_regnet-400mf_fpn_sbn-all_fp16_2x8_2x_nus-3d.py)."""
_base_ = ['./hv_pointpillars_regnet-400mf_fpn_sbn-all_4x8_2x_nus-3d.py']
model = dict(compute_dtype='bfloat16')
