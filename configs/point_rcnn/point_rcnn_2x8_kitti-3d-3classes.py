"""PointRCNN KITTI 3-class (mirror of
/root/reference/configs/point_rcnn/point_rcnn_2x8_kitti-3d-3classes.py:
cyclic AdamW lr 0.001 betas (0.95, 0.85), 80 epochs, 16384-point
samples)."""
_base_ = [
    '../_base_/models/point_rcnn.py',
    '../_base_/datasets/kitti-3d-3class.py',
    '../_base_/schedules/cyclic_40e.py',
    '../_base_/default_runtime.py',
]
optimizer = dict(lr=0.001, betas=(0.95, 0.85))
data = dict(samples_per_gpu=2, max_points=16384,
            db_sampler=dict(sample_groups=dict(
                _delete_=True, Car=20, Pedestrian=15, Cyclist=15)))
max_epochs = 80
log_interval = 30
