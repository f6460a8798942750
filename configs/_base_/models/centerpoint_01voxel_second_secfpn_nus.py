"""CenterPoint 0.1-voxel nuScenes model base (mirror of
/root/reference/configs/_base_/models/centerpoint_01voxel_second_secfpn_nus.py:
sparse shape [41,1024,1024], 6 task groups, velocity heads,
code_weights [1x8, 0.2, 0.2])."""
model = dict(
    type='CenterPointDetector',
    voxel_size=[0.1, 0.1, 0.2],
    point_cloud_range=[-51.2, -51.2, -5.0, 51.2, 51.2, 3.0],
    max_voxels=90000,
    sparse_shape=[41, 1024, 1024],
    tasks=[1, 2, 2, 1, 2, 2],
    with_velocity=True,
    code_weights=[1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 0.2, 0.2],
)
