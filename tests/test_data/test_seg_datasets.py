"""S3DIS + SemanticKITTI segmentation dataset backends."""
import os
import pickle

import numpy as np

from gga_tpu.data.seg_datasets import (S3DISSegDataset,
                                       SemanticKITTIDataset,
                                       SEMKITTI_LEARNING_MAP)


def test_s3dis_sample(tmp_path):
    pts = np.random.rand(500, 6).astype(np.float32)
    sem = np.random.randint(0, 13, 500).astype(np.int64)
    inst = np.random.randint(0, 20, 500).astype(np.int64)
    pts.tofile(tmp_path / 'pts.bin')
    sem.tofile(tmp_path / 'sem.bin')
    inst.tofile(tmp_path / 'inst.bin')
    infos = [dict(pts_path='pts.bin', pts_semantic_mask_path='sem.bin',
                  pts_instance_mask_path='inst.bin')]
    with open(tmp_path / 'infos.pkl', 'wb') as f:
        pickle.dump(infos, f)
    ds = S3DISSegDataset(str(tmp_path), str(tmp_path / 'infos.pkl'),
                         num_points=256)
    s = ds[0]
    assert s['points'].shape == (256, 6)
    assert s['seg_labels'].shape == (256,)
    assert s['seg_labels'].max() < 13
    assert ds.load_instance_mask(0).shape == (500,)
    batch = next(ds.epoch_batches(1))
    assert batch['points'].shape == (1, 256, 6)


def test_semantickitti_label_remap(tmp_path):
    pts = np.random.rand(300, 4).astype(np.float32)
    # raw ids: 10 = car -> 1 -> train id 0; 40 = road -> 9 -> 8;
    # 0 = unlabeled -> ignore; 252 = moving-car -> 1 -> 0
    raw = np.zeros(300, np.uint32)
    raw[:100] = 10
    raw[100:200] = 40
    raw[200:250] = 252
    # instance bits in the high 16 must not corrupt semantics
    raw[:100] |= np.uint32(7 << 16)
    pts.tofile(tmp_path / 'scan.bin')
    raw.tofile(tmp_path / 'scan.label')
    infos = [dict(pts_path='scan.bin',
                  pts_semantic_mask_path='scan.label')]
    with open(tmp_path / 'infos.pkl', 'wb') as f:
        pickle.dump(infos, f)
    ds = SemanticKITTIDataset(str(tmp_path),
                              str(tmp_path / 'infos.pkl'),
                              num_points=300, test_mode=True)
    s = ds[0]
    lab = s['seg_labels']
    assert (lab[:100] == 0).all()          # car
    assert (lab[100:200] == 8).all()       # road
    assert (lab[200:250] == 0).all()       # moving car -> car
    assert (lab[250:] == 255).all()        # unlabeled -> ignore
    assert set(SEMKITTI_LEARNING_MAP.values()) <= set(range(20))


def test_s3dis_patch_sampling(tmp_path):
    pts = np.zeros((400, 6), np.float32)
    # two spatial clusters far apart
    pts[:200, :2] = np.random.RandomState(0).uniform(0, 1, (200, 2))
    pts[200:, :2] = 10 + np.random.RandomState(1).uniform(0, 1, (200, 2))
    sem = np.zeros(400, np.int64)
    pts.tofile(tmp_path / 'pts.bin')
    sem.tofile(tmp_path / 'sem.bin')
    sem.tofile(tmp_path / 'inst.bin')
    infos = [dict(pts_path='pts.bin', pts_semantic_mask_path='sem.bin',
                  pts_instance_mask_path='inst.bin')]
    import pickle
    with open(tmp_path / 'infos.pkl', 'wb') as f:
        pickle.dump(infos, f)
    ds = S3DISSegDataset(str(tmp_path), str(tmp_path / 'infos.pkl'),
                         num_points=128, patch_sample=True)
    s = ds[0]
    xy = s['points'][:, :2]
    # a 1.5 m block can only contain one of the two clusters
    assert xy[:, 0].max() - xy[:, 0].min() <= 1.6
