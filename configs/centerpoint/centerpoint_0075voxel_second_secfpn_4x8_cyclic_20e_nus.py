"""CenterPoint 0.075-voxel nuScenes (mirror of /root/reference/configs/
centerpoint/centerpoint_0075voxel_second_secfpn_4x8_cyclic_20e_nus.py)."""
_base_ = ['./centerpoint_01voxel_second_secfpn_4x8_cyclic_20e_nus.py']
model = dict(
    voxel_size=[0.075, 0.075, 0.2],
    point_cloud_range=[-54.0, -54.0, -5.0, 54.0, 54.0, 3.0],
    max_voxels=120000,
    sparse_shape=[41, 1440, 1440],
    encoder_budgets=[120000, 80000, 50000],
    encoder_out_budget=50000,
)
