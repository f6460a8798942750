"""xyz-only (no color) SSG variant (reference
pointnet2_ssg_xyz-only_16x2_cosine_200e_scannet_seg-3d-20class.py)."""
_base_ = ['./pointnet2_ssg_16x2_cosine_200e_scannet_seg-3d-20class.py']
model = dict(in_channels=3)
data = dict(use_color=False)
