"""PointPillars + NoStemRegNet-1.6GF + FPN on nuScenes (mirror of
/root/reference/configs/free_anchor regnet-1.6gf backbone rows)."""
_base_ = ['./hv_pointpillars_regnet-400mf_fpn_sbn-all_4x8_2x_nus-3d.py']
model = dict(backbone='regnetx_1.6gf')
