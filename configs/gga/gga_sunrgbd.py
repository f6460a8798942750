"""FCAF3D retrain for the indoor GGA path (the README's "FCAF3D+GGA"
SUN RGB-D row; BASELINE.md 48.5 mAP@0.25). Same model/schedule as the
supervised fcaf3d sunrgbd config; only the info file points at pseudo
labels instead of GT.

Consumed by tools/train_fcaf3d.py.
"""
_base_ = '../fcaf3d/fcaf3d_8x2_sunrgbd-3d-10class.py'

data = dict(
    data_root='data/sunrgbd',
    info='data/sunrgbd/sunrgbd_infos_train_GGA_pseudo.pkl',
    num_points=20000,
)
work_dir = './work_dirs/sunrgbd_fcaf3d_gga'
