"""PointPillars + NoStemRegNet-400MF + FPN on nuScenes (mirror of
/root/reference/configs/regnet/
hv_pointpillars_regnet-400mf_fpn_sbn-all_4x8_2x_nus-3d.py; FPN levels
are fused to the finest map for the single-level anchor head — see
PointPillarsConfig.neck)."""
_base_ = ['./hv_pointpillars_regnet-400mf_secfpn_sbn-all_4x8_2x_nus-3d.py']
model = dict(
    neck='fpn',
    neck_channels=[256, 256, 256],
)
