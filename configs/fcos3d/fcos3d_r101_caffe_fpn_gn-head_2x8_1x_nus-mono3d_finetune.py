"""FCOS3D nus-mono3d fine-tune stage (mirror of /root/reference/configs/
fcos3d/fcos3d_r101_caffe_fpn_gn-head_dcn_2x8_1x_nus-mono3d_finetune.py:
same model, lower LR, load_from the stage-1 checkpoint)."""
_base_ = ['./fcos3d_r101_caffe_fpn_gn-head_2x8_1x_nus-mono3d.py']
lr = 0.001
load_from = 'work_dirs/fcos3d_nus_mono3d/latest'
