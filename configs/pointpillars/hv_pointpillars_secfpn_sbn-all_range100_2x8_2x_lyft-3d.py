"""Lyft at the extended 100 m range (reference
hv_pointpillars_secfpn_sbn-all_range100_2x8_2x_lyft-3d.py)."""
_base_ = ['./hv_pointpillars_secfpn_sbn-all_2x8_2x_lyft-3d.py']
model = dict(
    point_cloud_range=[-100, -100, -5, 100, 100, 3],
    scatter_shape=[800, 800],
    max_voxels=90000,
    head=dict(
        anchor_ranges=[[-100, -100, -1.07, 100, 100, -1.07]] * 9),
)
