"""Strong-augmentation 3x schedule variant (reference
hv_pointpillars_regnet-1.6gf_fpn_sbn-all_free-anchor_strong-aug_4x8_3x_nus-3d.py:
wider GlobalRotScaleTrans rotation/scale and a larger DB sampler)."""
_base_ = ['./hv_pointpillars_regnet-1.6gf_fpn_sbn-all_free-anchor_4x8_2x_nus-3d.py']
data = dict(
    rot_range=[-0.78539816, 0.78539816],
    scale_ratio_range=[0.9, 1.1],
)
max_epochs = 36
