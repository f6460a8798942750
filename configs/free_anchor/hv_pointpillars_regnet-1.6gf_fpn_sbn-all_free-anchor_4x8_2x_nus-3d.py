"""FreeAnchor PointPillars with a NoStemRegNet-1.6GF backbone (mirror of
/root/reference/configs/free_anchor/
hv_pointpillars_regnet-1.6gf_fpn_sbn-all_free-anchor_4x8_2x_nus-3d.py)."""
_base_ = ['./hv_pointpillars_fpn_sbn-all_free-anchor_4x8_2x_nus-3d.py']
model = dict(backbone='regnetx_1.6gf')
