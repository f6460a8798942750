"""PointPillars + NoStemRegNet-400MF + SECONDFPN on Lyft (mirror of
/root/reference/configs/regnet/
hv_pointpillars_regnet-400mf_secfpn_sbn-all_2x8_2x_lyft-3d.py)."""
_base_ = ['../pointpillars/hv_pointpillars_secfpn_sbn-all_2x8_2x_lyft-3d.py']
model = dict(
    backbone='regnetx_400mf',
    neck_channels=[128, 128, 128],
    neck_strides=[1, 2, 4],
)
