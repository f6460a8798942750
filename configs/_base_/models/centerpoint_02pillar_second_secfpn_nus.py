"""CenterPoint 0.2-pillar nuScenes model base (mirror of
/root/reference/configs/_base_/models/centerpoint_02pillar_second_secfpn_nus.py:
PillarFeatureNet(64) + PointPillarsScatter(512x512) + 3-level SECOND +
SECONDFPN with 0.5/1/2 upsample strides, out_size_factor 4)."""
model = dict(
    type='CenterPointDetector',
    pillar=True,
    voxel_size=[0.2, 0.2, 8],
    point_cloud_range=[-51.2, -51.2, -5.0, 51.2, 51.2, 3.0],
    max_points_per_voxel=20,
    max_voxels=30000,
    pfn_channels=[64],
    scatter_shape=[512, 512],
    backbone_channels=[64, 128, 256],
    backbone_layers=[3, 5, 5],
    backbone_strides=[2, 2, 2],
    neck_channels=[128, 128, 128],
    neck_strides=[0.5, 1, 2],
    tasks=[1, 2, 2, 1, 2, 2],
    with_velocity=True,
    out_size_factor=4,
    code_weights=[1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 0.2, 0.2],
)
