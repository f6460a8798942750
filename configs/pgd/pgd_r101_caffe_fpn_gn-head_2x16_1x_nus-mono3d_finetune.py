"""Fine-tune stage of the nus PGD (reference
pgd_r101_caffe_fpn_gn-head_2x16_1x_nus-mono3d_finetune.py: same model,
lower lr, load_from the 1x checkpoint)."""
_base_ = ['./pgd_r101_caffe_fpn_gn-head_2x16_1x_nus-mono3d.py']
optimizer = dict(lr=0.002)
load_from = 'work_dirs/pgd_r101_caffe_fpn_gn-head_2x16_1x_nus-mono3d/latest'
