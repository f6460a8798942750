"""PointPillars model base (mirror of
/root/reference/configs/_base_/models/hv_pointpillars_secfpn_kitti.py)."""
model = dict(
    type='PointPillars',
    voxel_size=[0.16, 0.16, 4],
    point_cloud_range=[0, -39.68, -3, 69.12, 39.68, 1],
    max_points_per_voxel=32,
    max_voxels=16000,
    pfn_channels=[64],
    scatter_shape=[496, 432],
    backbone_channels=[64, 128, 256],
    backbone_layers=[3, 5, 5],
    backbone_strides=[2, 2, 2],
    neck_channels=[128, 128, 128],
    neck_strides=[1, 2, 4],
)
