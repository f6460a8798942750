"""KITTI monocular 3D dataset for PGD retraining (stage 4).

Rebuild of KittiMonoDataset
(/root/reference/mmdet3d/datasets/kitti_mono_dataset.py:17) fed directly
from (pseudo) info pkls — the COCO-json indirection of the reference
(create_data_gga_retrain_mono) is kept as an exporter for format parity
(``mono_export``), but the dataset reads the pkl directly.

Static batch format: images padded to (384, 1248), objects to max_objs.
Note: horizontal-flip augmentation is deferred (camera-frame flip couples
with the principal point); the reference's resize is identity for KITTI
(img_scale == native resolution).
"""
from __future__ import annotations

import os
import pickle

import numpy as np

IMG_H, IMG_W = 384, 1248  # KITTI (375, 1242) padded to 32-divisor
# caffe-style normalization (gga_pdg.py img_norm_cfg: BGR mean, std 1)
IMG_MEAN = np.array([103.530, 116.280, 123.675], np.float32)


class KittiMonoDataset:
    CLASSES = ('Pedestrian', 'Cyclist', 'Car')

    def __init__(self, root, info_path, *, max_objs=64, min_score=None,
                 test_mode=False, seed=0):
        with open(info_path, 'rb') as f:
            self.infos = pickle.load(f)
        self.root = root
        self.max_objs = max_objs
        self.min_score = min_score
        self.test_mode = test_mode
        self._rng = np.random.RandomState(seed)

    def __len__(self):
        return len(self.infos)

    def _load_image(self, info):
        from PIL import Image
        path = os.path.join(self.root, info['image']['image_path'])
        img = np.asarray(Image.open(path).convert('RGB'), np.float32)
        img = img[..., ::-1]  # RGB -> BGR (caffe norm, to_rgb=False)
        img = img - IMG_MEAN
        out = np.zeros((IMG_H, IMG_W, 3), np.float32)
        h = min(img.shape[0], IMG_H)
        w = min(img.shape[1], IMG_W)
        out[:h, :w] = img[:h, :w]
        return out

    def __getitem__(self, idx):
        info = self.infos[idx]
        img = self._load_image(info)
        P2 = info['calib']['P2'].astype(np.float32)
        M = self.max_objs

        item = dict(
            image=img,
            cam2img=P2,
            gt_bboxes=np.zeros((M, 4), np.float32),
            gt_labels=np.full((M,), -1, np.int32),
            gt_cam3d=np.zeros((M, 7), np.float32),
            centers2d=np.zeros((M, 2), np.float32),
            depths=np.zeros((M,), np.float32),
            obj_valid=np.zeros((M,), bool),
        )
        if self.test_mode or 'annos' not in info:
            return item

        annos = info['annos']
        keep = np.array([n in self.CLASSES for n in annos['name']], bool)
        if self.min_score is not None and 'score' in annos and \
                len(annos['score']):
            keep &= annos['score'] >= self.min_score
        names = annos['name'][keep]
        loc = annos['location'][keep].astype(np.float32)
        dims = annos['dimensions'][keep].astype(np.float32)  # (l, h, w)
        rots = annos['rotation_y'][keep].astype(np.float32)
        bboxes = annos['bbox'][keep].astype(np.float32)

        # gravity center in camera frame: y points down, loc is the bottom
        gravity = loc.copy()
        gravity[:, 1] -= dims[:, 1] / 2.0
        hom = np.concatenate([gravity, np.ones((len(gravity), 1))], -1)
        uvw = hom @ P2.T
        centers2d = uvw[:, :2] / np.maximum(uvw[:, 2:3], 1e-5)
        depths = uvw[:, 2]

        n = min(len(names), M)
        item['gt_bboxes'][:n] = bboxes[:n]
        item['gt_labels'][:n] = [self.CLASSES.index(x) for x in names[:n]]
        item['gt_cam3d'][:n] = np.concatenate(
            [gravity, dims, rots[:, None]], -1)[:n]
        item['centers2d'][:n] = centers2d[:n]
        item['depths'][:n] = depths[:n]
        # ignore objects behind the camera or projecting off-image
        ok = (depths[:n] > 0.1) & (centers2d[:n, 0] > -200) \
            & (centers2d[:n, 0] < IMG_W + 200)
        item['obj_valid'][:n] = ok
        return item

    def epoch_batches(self, batch_size, shuffle=True, seed=None,
                      drop_last=True):
        order = np.arange(len(self))
        if shuffle:
            np.random.RandomState(seed or 0).shuffle(order)
        n = len(order) // batch_size * batch_size if drop_last else \
            len(order)
        for i in range(0, n, batch_size):
            items = [self[j] for j in order[i:i + batch_size]]
            yield {k: np.stack([it[k] for it in items]) for k in items[0]}
