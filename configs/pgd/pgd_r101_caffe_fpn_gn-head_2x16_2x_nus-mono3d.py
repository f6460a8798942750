"""2x-schedule nus PGD (reference
pgd_r101_caffe_fpn_gn-head_2x16_2x_nus-mono3d.py)."""
_base_ = ['./pgd_r101_caffe_fpn_gn-head_2x16_1x_nus-mono3d.py']
optimizer = dict(lr_steps=(16, 22))
max_epochs = 24
