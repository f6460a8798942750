"""MVX-Net KITTI (mirror of
/root/reference/configs/mvxnet/dv_mvx-fpn_second_secfpn_adamw_2x8_40e_kitti-3d-3class.py:
image ResNet50+FPN fused into a dynamic-voxel SECOND stack)."""
_base_ = [
    '../_base_/datasets/kitti-3d-3class.py',
    '../_base_/schedules/cosine.py',
    '../_base_/default_runtime.py',
]
model = dict(
    type='MVXNet',
    img_depth=50,
    vfe_channels=[64, 64],
)
data = dict(samples_per_gpu=2)
