"""Fine-tune stage of the 2x nus PGD (reference
pgd_r101_caffe_fpn_gn-head_2x16_2x_nus-mono3d_finetune.py)."""
_base_ = ['./pgd_r101_caffe_fpn_gn-head_2x16_2x_nus-mono3d.py']
optimizer = dict(lr=0.002)
load_from = 'work_dirs/pgd_r101_caffe_fpn_gn-head_2x16_2x_nus-mono3d/latest'
