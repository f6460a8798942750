"""KITTI car-only LiDAR dataset block (mirror of
/root/reference/configs/_base_/datasets/kitti-3d-car.py)."""
_base_ = ['kitti-3d-3class.py']
class_names = ['Car']
data = dict(db_sampler=dict(
    _delete_=True,
    rate=1.0,
    prepare=dict(filter_by_difficulty=[-1],
                 filter_by_min_points=dict(Car=5)),
    sample_groups=dict(Car=15)))
