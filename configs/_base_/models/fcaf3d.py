"""FCAF3D model base (mirror of
/root/reference/configs/_base_/models/fcaf3d.py: MinkResNet34 backbone,
voxel 0.01, head channels (64,128,256,512)->128)."""
model = dict(
    type='FCAF3DDetector',
    voxel_size=0.01,
    depth=34,
    head=dict(voxel_size=0.01),
)
