"""Datasets: KITTI GGA train/eval views over info pkls.

Replaces the reference's KittiDataset_GGA{_train,_match} classes
(/root/reference/mmdet3d/datasets/kitti_dataset_GGA_train.py:21) with a
thin host-side dataset that runs the functional pipeline and emits
fixed-shape batches for the jitted step.
"""
from __future__ import annotations

import pickle

import numpy as np

from . import pipelines as pl


class KittiGGADataset:
    CLASSES = ('Pedestrian', 'Cyclist', 'Car')

    def __init__(self, root, info_path, *, db_sampler=None,
                 pc_range=(0, -40, -3, 70.4, 40, 1), num_points_range=15,
                 pts_prefix='velodyne_reduced', max_points=24000,
                 max_objs=128, max_cluster_pts=256, min_distance=5.0,
                 test_mode=False, seed=0):
        with open(info_path, 'rb') as f:
            self.infos = pickle.load(f)
        self.root = root
        self.db_sampler = db_sampler
        self.pc_range = tuple(pc_range)
        self.num_points_range = num_points_range
        self.pts_prefix = pts_prefix
        self.shapes = (max_points, max_objs, max_cluster_pts)
        self.min_distance = min_distance
        self.test_mode = test_mode
        self._rng_seed = seed
        self._rng = np.random.RandomState(seed)

    def __len__(self):
        return len(self.infos)

    epoch = 0  # set by the loader; mixed into per-item rng keys

    def _item_rng(self, idx):
        # per-item rng derived from (seed, epoch, idx): augmentation is
        # deterministic regardless of loader worker count, yet still
        # varies across epochs (the reference's stateful worker rngs give
        # epoch variety but are worker-count dependent)
        return np.random.RandomState(
            (self._rng_seed * 1000003 + self.epoch * 7919
             + idx * 9176) % (2 ** 31 - 1))

    def get_sample(self, idx, rng=None):
        """Raw pipeline output (pre-formatting), for eval/inspection."""
        rng = rng or self._item_rng(idx)
        s = pl.load_sample(self.infos[idx], self.root,
                           pts_prefix=self.pts_prefix,
                           classes=self.CLASSES)
        if not self.test_mode:
            if self.db_sampler is not None:
                s = pl.object_sample_gga(s, self.db_sampler,
                                         self.min_distance, rng)
            s = pl.points_range_filter(s, self.pc_range)
            s = pl.object_range_filter_gga(s, self.pc_range,
                                           self.num_points_range)
            s = pl.point_shuffle(s, rng)
        else:
            s = pl.points_range_filter(s, self.pc_range)
        return s

    def __getitem__(self, idx):
        rng = self._item_rng(idx)
        s = self.get_sample(idx, rng)
        P, M, Pc = self.shapes
        item = pl.format_gga_batch_item(s, P, M, Pc, rng)
        item['sample_idx'] = np.asarray(s['sample_idx'], np.int64)
        return item

    def epoch_batches(self, batch_size, shuffle=True, seed=None,
                      drop_last=True):
        """Deterministic per-epoch batch iterator (host-side)."""
        order = np.arange(len(self))
        if shuffle:
            np.random.RandomState(seed or 0).shuffle(order)
        n = (len(order) // batch_size * batch_size if drop_last
             else len(order))
        for i in range(0, n, batch_size):
            idxs = order[i:i + batch_size]
            if len(idxs) < batch_size and drop_last:
                break
            yield pl.collate([self[j] for j in idxs])


class PrefetchLoader:
    """Process-parallel batch loader with background prefetch.

    The jitted step consumes ~1000 scenes/s on a v5e chip; single-threaded
    python formatting (~100-200 scenes/s) would starve it (the reference
    uses 4 loader workers per GPU, apis/train.py:208). Workers each own a
    dataset replica (datasets are constructed from picklable args) and
    format whole batches; results stream through an imap pipeline.
    """

    def __init__(self, dataset, batch_size, num_workers=8, prefetch=4,
                 seed=0):
        self.dataset = dataset
        self.batch_size = batch_size
        self.num_workers = num_workers
        self.prefetch = prefetch
        self.seed = seed

    def epoch(self, epoch_idx):
        import multiprocessing as mp

        self.dataset.epoch = epoch_idx  # fork inherits; serial path too
        order = np.arange(len(self.dataset))
        np.random.RandomState(self.seed + epoch_idx).shuffle(order)
        n = len(order) // self.batch_size * self.batch_size
        chunks = [order[i:i + self.batch_size].tolist()
                  for i in range(0, n, self.batch_size)]
        if self.num_workers <= 1:
            for c in chunks:
                yield pl.collate([self.dataset[j] for j in c])
            return
        ctx = mp.get_context('fork')
        with ctx.Pool(self.num_workers, initializer=_loader_init,
                      initargs=(self.dataset,)) as pool:
            for batch in pool.imap(_loader_batch, chunks,
                                   chunksize=1):
                yield batch


_LOADER_DS = None


def _loader_init(ds):
    global _LOADER_DS
    _LOADER_DS = ds


def _loader_batch(idxs):
    return pl.collate([_LOADER_DS[j] for j in idxs])
