"""nuScenes monocular 3D dataset (coco-style mono3d annotations).

Rebuild of NuScenesMonoDataset
(/root/reference/mmdet3d/datasets/nuscenes_mono_dataset.py:20): consumes
the ``*_mono3d.coco.json`` produced by the nuScenes converter's 2D
export — per image a camera intrinsic and per annotation a camera-frame
box (gravity center + dims + yaw), projected center + depth, velocity
and attribute label. Static padded samples in the same layout our
monocular heads consume (SMOKE / MonoFlex / PGD).
"""
from __future__ import annotations

import json
import os

import numpy as np

NUS_MONO_CLASSES = ('car', 'truck', 'trailer', 'bus',
                    'construction_vehicle', 'bicycle', 'motorcycle',
                    'pedestrian', 'traffic_cone', 'barrier')
ATTRIBUTES = ('cycle.with_rider', 'cycle.without_rider',
              'pedestrian.moving', 'pedestrian.standing',
              'pedestrian.sitting_lying_down', 'vehicle.moving',
              'vehicle.parked', 'vehicle.stopped', 'None')

IMG_H, IMG_W = 928, 1600


class NuScenesMonoDataset:
    CLASSES = NUS_MONO_CLASSES

    def __init__(self, root, ann_file, *, max_objs=64, test_mode=False,
                 seed=0):
        with open(ann_file) as f:
            coco = json.load(f)
        self.root = root
        self.max_objs = max_objs
        self.test_mode = test_mode
        self._rng = np.random.RandomState(seed)
        self.images = {im['id']: im for im in coco['images']}
        self.img_ids = sorted(self.images)
        self.anns = {i: [] for i in self.img_ids}
        self.cat_to_label = {c['id']: i for i, c in
                             enumerate(coco.get('categories', []))}
        for a in coco.get('annotations', []):
            if a['image_id'] in self.anns:
                self.anns[a['image_id']].append(a)

    def __len__(self):
        return len(self.img_ids)

    def _load_image(self, im):
        from PIL import Image
        path = os.path.join(self.root, im['file_name'])
        img = np.asarray(Image.open(path).convert('RGB'), np.float32)
        out = np.zeros((IMG_H, IMG_W, 3), np.float32)
        h = min(img.shape[0], IMG_H)
        w = min(img.shape[1], IMG_W)
        out[:h, :w] = img[:h, :w]
        return out

    def __getitem__(self, idx):
        im = self.images[self.img_ids[idx]]
        anns = self.anns[self.img_ids[idx]]
        cam2img = np.eye(4, dtype=np.float32)
        k = np.asarray(im['cam_intrinsic'], np.float32)
        cam2img[:3, :3] = k

        M = self.max_objs
        boxes_cam = np.zeros((M, 7), np.float32)
        bboxes2d = np.zeros((M, 4), np.float32)
        centers2d = np.zeros((M, 2), np.float32)
        depths = np.zeros((M,), np.float32)
        velo = np.zeros((M, 2), np.float32)
        labels = np.zeros((M,), np.int64)
        attrs = np.full((M,), len(ATTRIBUTES) - 1, np.int64)
        valid = np.zeros((M,), bool)
        n = 0
        for a in anns:
            if n >= M or 'bbox_cam3d' not in a:
                continue
            b3d = np.asarray(a['bbox_cam3d'], np.float32).reshape(-1)
            # coco export: gravity center -> bottom center (y down)
            box = b3d[:7].copy()
            box[1] += box[4] / 2
            boxes_cam[n] = box
            x, y, w, h = a['bbox']
            bboxes2d[n] = [x, y, x + w, y + h]
            c2d = np.asarray(a.get('center2d', [0, 0, 0]), np.float32)
            centers2d[n] = c2d[:2]
            depths[n] = c2d[2] if len(c2d) > 2 else box[2]
            if 'velo_cam3d' in a:
                velo[n] = np.nan_to_num(
                    np.asarray(a['velo_cam3d'], np.float32).reshape(-1)[:2])
            labels[n] = self.cat_to_label.get(a['category_id'], 0)
            if 'attribute_name' in a and \
                    a['attribute_name'] in ATTRIBUTES:
                attrs[n] = ATTRIBUTES.index(a['attribute_name'])
            valid[n] = True
            n += 1

        return dict(img=self._load_image(im), cam2img=cam2img,
                    gt_boxes_cam=boxes_cam, gt_bboxes2d=bboxes2d,
                    centers2d=centers2d, depths=depths,
                    gt_velocities=velo, gt_labels=labels,
                    gt_attrs=attrs, obj_valid=valid, sample_idx=idx)

    def epoch_batches(self, batch_size, shuffle=True, seed=0):
        order = np.arange(len(self))
        if shuffle:
            np.random.RandomState(seed).shuffle(order)
        for i in range(0, len(order) - batch_size + 1, batch_size):
            samples = [self[j] for j in order[i:i + batch_size]]
            yield {k: np.stack([s[k] for s in samples])
                   for k in samples[0]}
