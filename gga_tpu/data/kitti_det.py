"""Fully-supervised KITTI / Waymo detection datasets.

Rebuilds of KittiDataset (/root/reference/mmdet3d/datasets/
kitti_dataset.py:19, the 3D-GT-supervised path used by SECOND /
PointPillars / PartA2 / PointRCNN) and WaymoDataset
(waymo_dataset.py:15 — mmdet3d consumes Waymo CONVERTED to kitti-format
infos, so the dataset is a thin variant: 6-dim points, its own class
set and pts prefix). Standard train augmentation: global flip /
rotate / scale + range filters, static padded outputs.

Scope note: the official Waymo metric needs the TF-based waymo devkit
(external); `eval/kitti_eval.py` scores the kitti-format annotations
as the reference does for its kitti-style AP report.
"""
from __future__ import annotations

import os
import pickle

import numpy as np

from ..core import np_geometry as ng


class KittiDetDataset:
    CLASSES = ('Pedestrian', 'Cyclist', 'Car')
    POINT_DIM = 4

    def __init__(self, root, info_path, *,
                 pc_range=(0, -40, -3, 70.4, 40, 1),
                 pts_prefix='velodyne_reduced', max_points=24000,
                 max_objs=64, test_mode=False, seed=0,
                 flip_ratio=0.5, rot_range=(-0.78539816, 0.78539816),
                 scale_range=(0.95, 1.05)):
        with open(info_path, 'rb') as f:
            self.infos = pickle.load(f)
        self.root = root
        self.pc_range = np.asarray(pc_range, np.float32)
        self.pts_prefix = pts_prefix
        self.max_points = max_points
        self.max_objs = max_objs
        self.test_mode = test_mode
        self.seed = seed
        self.epoch = 0
        self.flip_ratio = flip_ratio
        self.rot_range = rot_range
        self.scale_range = scale_range

    def __len__(self):
        return len(self.infos)

    def _item_rng(self, idx):
        return np.random.RandomState(
            (self.seed * 1000003 + self.epoch * 7919 + idx * 9176)
            % (2 ** 31 - 1))

    def _load_points(self, info):
        rel = info['point_cloud']['velodyne_path']
        if self.pts_prefix != 'velodyne':
            rel = rel.replace('velodyne', self.pts_prefix)
        pts = np.fromfile(os.path.join(self.root, rel), np.float32)
        return pts.reshape(-1, self.POINT_DIM)

    def _gt_lidar(self, info):
        """Camera-frame annos -> lidar bottom-center boxes + labels."""
        a = info['annos']
        n = int((np.asarray(a['name']) != 'DontCare').sum())
        names = np.asarray(a['name'])[:n]
        keep = np.array([nm in self.CLASSES for nm in names], bool)
        rect = info['calib']['R0_rect']
        trv2c = info['calib']['Tr_velo_to_cam']
        loc = np.asarray(a['location'])[:n][keep]
        dims = np.asarray(a['dimensions'])[:n][keep]   # l, h, w
        rots = np.asarray(a['rotation_y'])[:n][keep]
        if len(loc) == 0:
            return np.zeros((0, 7)), np.zeros(0, np.int64)
        boxes_cam = np.concatenate(
            [loc, dims, rots[:, None]], -1)
        boxes = ng.box_camera_to_lidar(boxes_cam, rect, trv2c)
        labels = np.array([self.CLASSES.index(nm)
                           for nm in names[keep]], np.int64)
        return boxes, labels

    def get_sample(self, idx):
        info = self.infos[idx]
        rng = self._item_rng(idx)
        pts = self._load_points(info)
        boxes, labels = self._gt_lidar(info)

        if not self.test_mode:
            if rng.rand() < self.flip_ratio:       # RandomFlip3D (y)
                pts[:, 1] = -pts[:, 1]
                if len(boxes):
                    boxes[:, 1] = -boxes[:, 1]
                    boxes[:, 6] = -boxes[:, 6]
            ang = rng.uniform(*self.rot_range)     # GlobalRotScaleTrans
            c, s = np.cos(ang), np.sin(ang)
            rot = np.array([[c, s], [-s, c]], np.float32)
            pts[:, :2] = pts[:, :2] @ rot
            if len(boxes):
                boxes[:, :2] = boxes[:, :2] @ rot
                boxes[:, 6] += ang
            sc = rng.uniform(*self.scale_range)
            pts[:, :3] *= sc
            if len(boxes):
                boxes[:, :6] *= sc

        inr = ((pts[:, :3] >= self.pc_range[:3])
               & (pts[:, :3] <= self.pc_range[3:])).all(1)
        pts = pts[inr]
        if len(boxes):
            binr = ((boxes[:, :2] >= self.pc_range[:2])
                    & (boxes[:, :2] <= self.pc_range[3:5])).all(1)
            boxes, labels = boxes[binr], labels[binr]

        P = self.max_points
        out = np.zeros((P, self.POINT_DIM), np.float32)
        if len(pts) > P:
            sel = rng.choice(len(pts), P, replace=False)
            pts = pts[sel]
        out[:len(pts)] = pts
        valid = np.zeros(P, bool)
        valid[:len(pts)] = True

        G = self.max_objs
        gb = np.zeros((G, 7), np.float32)
        gl = np.full(G, -1, np.int64)
        gv = np.zeros(G, bool)
        k = min(len(boxes), G)
        gb[:k] = boxes[:k]
        gl[:k] = labels[:k]
        gv[:k] = True
        return dict(points=out, points_valid=valid, gt_boxes=gb,
                    gt_labels=gl, gt_valid=gv, sample_idx=idx)

    def epoch_batches(self, batch_size, shuffle=True, seed=0):
        order = np.arange(len(self))
        if shuffle:
            np.random.RandomState(seed).shuffle(order)
        for i in range(0, len(order) - batch_size + 1, batch_size):
            samples = [self.get_sample(j)
                       for j in order[i:i + batch_size]]
            yield {k: np.stack([s[k] for s in samples])
                   for k in samples[0]}


class WaymoDataset(KittiDetDataset):
    """Waymo in kitti-format infos (waymo_dataset.py:15): 6-dim points
    (xyz, intensity, elongation, timestamp), Car/Cyclist/Pedestrian."""
    CLASSES = ('Car', 'Cyclist', 'Pedestrian')
    POINT_DIM = 6

    def __init__(self, root, info_path, *,
                 pc_range=(-74.88, -74.88, -2, 74.88, 74.88, 4),
                 pts_prefix='velodyne', max_points=180000, **kwargs):
        super().__init__(root, info_path, pc_range=pc_range,
                         pts_prefix=pts_prefix, max_points=max_points,
                         **kwargs)


def object_noise(pts, boxes, labels, rng, *, translation_std=(1.0, 1.0, 0.5),
                 rot_range=(-0.78539816, 0.78539816), num_try=100):
    """Per-GT jitter with collision rejection (ObjectNoise,
    /root/reference/mmdet3d/datasets/pipelines/transforms_3d.py:540):
    each box tries up to ``num_try`` random (translation, yaw) samples
    and keeps the first whose BEV footprint stays disjoint from every
    other (noised) box; its interior points move rigidly with it."""

    boxes = boxes.copy()
    pts = pts.copy()
    if len(boxes) == 0:
        return pts, boxes

    inbox = ng.points_in_rbbox(pts[:, :3], boxes)       # [N, G]
    for g in range(len(boxes)):
        for _ in range(num_try):
            t = rng.normal(scale=translation_std, size=3)
            ang = rng.uniform(*rot_range)
            cand = boxes[g].copy()
            cand[:3] += t
            cand[6] += ang
            others = np.delete(np.arange(len(boxes)), g)
            if len(others) == 0 or not _bev_collides(
                    cand, boxes[others]):
                sel = inbox[:, g]
                local = pts[sel, :3] - boxes[g, :3]
                c, s = np.cos(ang), np.sin(ang)
                rot = np.array([[c, s, 0], [-s, c, 0], [0, 0, 1]],
                               np.float32)
                pts[sel, :3] = local @ rot + cand[:3]
                boxes[g] = cand
                break
    return pts, boxes


def _bev_collides(box, others):
    """Axis-aligned (nearest-BEV) overlap test, matching the noise
    rejection's cheap collision check."""
    def aabb(b):
        # nearest-axis-aligned footprint: swap extents when the yaw is
        # closer to +-pi/2 than to 0/pi
        rot = np.abs((b[..., 6] + np.pi / 2) % np.pi - np.pi / 2)
        swap = rot > np.pi / 4
        dx = np.where(swap, b[..., 4], b[..., 3])
        dy = np.where(swap, b[..., 3], b[..., 4])
        return np.stack([b[..., 0] - dx / 2, b[..., 1] - dy / 2,
                         b[..., 0] + dx / 2, b[..., 1] + dy / 2], -1)

    a = aabb(box)
    o = aabb(others)
    ix = np.minimum(a[2], o[..., 2]) - np.maximum(a[0], o[..., 0])
    iy = np.minimum(a[3], o[..., 3]) - np.maximum(a[1], o[..., 1])
    return bool(((ix > 0) & (iy > 0)).any())


class Kitti2DDataset:
    """2D-bbox view over the same kitti info pkls (rebuild of
    /root/reference/mmdet3d/datasets/kitti2d_dataset.py:10): per sample
    the image path/shape and the camera-plane boxes + labels, statically
    padded — the input contract of a 2D detector trained on KITTI."""
    CLASSES = ('car', 'pedestrian', 'cyclist')

    def __init__(self, root, info_path, *, max_objs=32,
                 filter_empty_gt=True, test_mode=False):
        with open(info_path, 'rb') as f:
            infos = pickle.load(f)
        self.root = root
        self.max_objs = max_objs
        self.test_mode = test_mode
        if filter_empty_gt and not test_mode:
            infos = [i for i in infos
                     if self._boxes(i)[0].shape[0] > 0]
        self.infos = infos

    def _boxes(self, info):
        a = info['annos']
        names = np.asarray(a['name'])
        keep = np.array([n.lower() in self.CLASSES for n in names], bool)
        boxes = np.asarray(a['bbox'], np.float32).reshape(-1, 4)[keep]
        labels = np.array([self.CLASSES.index(n.lower())
                           for n in names[keep]], np.int64)
        return boxes, labels

    def __len__(self):
        return len(self.infos)

    def __getitem__(self, idx):
        info = self.infos[idx]
        boxes, labels = self._boxes(info)
        M = self.max_objs
        gb = np.zeros((M, 4), np.float32)
        gl = np.full(M, -1, np.int64)
        gv = np.zeros(M, bool)
        k = min(len(boxes), M)
        gb[:k] = boxes[:k]
        gl[:k] = labels[:k]
        gv[:k] = True
        return dict(
            img_path=os.path.join(self.root,
                                  info['image']['image_path']),
            img_shape=np.asarray(info['image']['image_shape']),
            gt_bboxes=gb, gt_labels=gl, gt_valid=gv)
