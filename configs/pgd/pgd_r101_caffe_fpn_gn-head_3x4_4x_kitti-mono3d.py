"""PGD KITTI with the caffe-style R101 stem (reference
pgd_r101_caffe_fpn_gn-head_3x4_4x_kitti-mono3d.py): the caffe/pytorch
distinction is a pretrained-weight layout detail; the TPU rebuild's
ResNet uses one canonical stem, so this is an alias of the kitti-mono3d
config kept for name parity."""
_base_ = ['./pgd_r101_fpn_3x4_4x_kitti-mono3d.py']
