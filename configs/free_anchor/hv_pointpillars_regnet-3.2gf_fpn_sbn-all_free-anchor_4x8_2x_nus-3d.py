"""FreeAnchor + RegNet-3.2GF (reference
hv_pointpillars_regnet-3.2gf_fpn_sbn-all_free-anchor_4x8_2x_nus-3d.py)."""
_base_ = ['./hv_pointpillars_regnet-1.6gf_fpn_sbn-all_free-anchor_4x8_2x_nus-3d.py']
model = dict(backbone='regnetx_3.2gf')
