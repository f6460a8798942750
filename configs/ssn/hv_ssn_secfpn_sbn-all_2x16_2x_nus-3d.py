"""SSN (shape-aware grouping head) on nuScenes (mirror of
/root/reference/configs/ssn/hv_ssn_secfpn_sbn-all_2x16_2x_nus-3d.py):
classes grouped by shape, per-group conv stacks (strided for large
objects), per-class anchors + per-class MaxIoU thresholds.
Class order: bicycle, motorcycle, pedestrian, traffic_cone, barrier,
car, truck, trailer, bus, construction_vehicle."""
_base_ = [
    '../_base_/datasets/nus-3d.py',
    '../_base_/schedules/schedule_3x.py',
    '../_base_/default_runtime.py',
]
model = dict(
    type='SSNDetector',
    voxel_size=[0.25, 0.25, 8],
    point_cloud_range=[-50, -50, -5, 50, 50, 3],
    max_points_per_voxel=20,
    max_voxels=32000,
    pfn_channels=[64],
    scatter_shape=[400, 400],
    neck_channels=[128, 128, 128],
    neck_strides=[1, 2, 4],
    head=dict(
        num_classes=10,
        anchor_z=[-1.67339111, -1.71396371, -1.61785072, -1.80984986,
                  -1.76396500, -1.80032795, -1.74440365, -1.68526504,
                  -1.80673031, -1.64824291],
        anchor_sizes=[[1.68452161, 0.60058911, 1.27192197],
                      [2.09973778, 0.76279481, 1.44403034],
                      [0.72564370, 0.66344886, 1.75748069],
                      [0.40359262, 0.39694519, 1.06232151],
                      [0.48578221, 2.49008838, 0.98297065],
                      [4.60718145, 1.95017717, 1.72270761],
                      [6.73778078, 2.45609390, 2.73004906],
                      [12.01320693, 2.87427237, 3.81509561],
                      [11.1885991, 2.94046906, 3.47030982],
                      [6.38352896, 2.73050468, 3.13312415]],
        class_to_task=[0, 0, 1, 2, 2, 3, 4, 4, 4, 4],
        tasks=[
            dict(num_class=2, shared_conv_channels=[64, 64],
                 shared_conv_strides=[1, 1]),
            dict(num_class=1, shared_conv_channels=[64, 64],
                 shared_conv_strides=[1, 1]),
            dict(num_class=2, shared_conv_channels=[64, 64],
                 shared_conv_strides=[1, 1]),
            dict(num_class=1, shared_conv_channels=[64, 64, 64],
                 shared_conv_strides=[2, 1, 1]),
            dict(num_class=4, shared_conv_channels=[64, 64, 64],
                 shared_conv_strides=[2, 1, 1]),
        ],
        bev_range=[-50, -50, 50, 50],
        pos_iou_thr=[0.5, 0.5, 0.6, 0.6, 0.55, 0.6, 0.55, 0.5, 0.55,
                     0.5],
        neg_iou_thr=[0.35, 0.3, 0.4, 0.4, 0.4, 0.45, 0.4, 0.35, 0.4,
                     0.35],
        min_pos_iou=[0.35, 0.3, 0.4, 0.4, 0.4, 0.45, 0.4, 0.35, 0.4,
                     0.35],
        dir_offset=-0.7854),
)
max_epochs = 24
