"""SECOND model base (mirror of
/root/reference/configs/_base_/models/hv_second_secfpn_kitti.py; the
remaining knobs live as SECONDNetConfig dataclass defaults)."""
model = dict(
    type='SECONDDetector',
    voxel_size=[0.05, 0.05, 0.1],
    point_cloud_range=[0, -40, -3, 70.4, 40, 1],
    max_points_per_voxel=5,
    max_voxels=16000,
    sparse_shape=[41, 1600, 1408],
    backbone_channels=[128, 256],
    backbone_layers=[5, 5],
    neck_channels=[256, 256],
)
