"""Part-A2 model base (mirror of
/root/reference/configs/_base_/models/parta2.py; UNet + RPN + RoI knobs
live as PartA2Config dataclass defaults)."""
model = dict(
    type='PartA2Detector',
    voxel_size=[0.05, 0.05, 0.1],
    point_cloud_range=[0, -40, -3, 70.4, 40, 1],
    max_voxels=16000,
    sparse_shape=[41, 1600, 1408],
)
