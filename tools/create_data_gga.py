"""Stage 1: KITTI data preparation with GGA weak-label generation.

Equivalent of /root/reference/tools/create_data_gga.py:18-56 (info pkls
augmented with GGA fields, reduced clouds, pseudo GT database), with the
per-scene weak-label generation parallelized over processes like the
reference's Pool(60) (kitti_converter_gga.py:74-79).

Usage:
    python tools/create_data_gga.py kitti --root-path data/kitti \
        --out-dir data/kitti [--workers 32]
"""
import argparse
import os
import pickle
import sys
from multiprocessing import Pool

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from gga_tpu.data.kitti import io as kio  # noqa: E402
from gga_tpu.data.kitti.gga_labels import calculate_gga_labels  # noqa: E402
from gga_tpu.data.kitti.gt_database import (  # noqa: E402
    create_gga_gt_database, create_reduced_point_clouds)


def _process_scene(args):
    root, split, idx = args
    info = kio.create_scene_info(root, split, idx)
    if 'annos' in info:
        kio.compute_num_points_in_gt(root, info)
        pts = kio.load_velodyne(
            os.path.join(root, info['point_cloud']['velodyne_path']))
        calculate_gga_labels(pts, info, rng=np.random.RandomState(idx))
    return info


def kitti_data_prep(root, out_dir, workers=16):
    os.makedirs(out_dir, exist_ok=True)
    split_infos = {}
    for split in ('train', 'val'):
        try:
            ids = kio.read_split_ids(root, split)
        except FileNotFoundError:
            print(f'split file for {split!r} missing, skipping')
            continue
        print(f'[{split}] {len(ids)} scenes: generating GGA weak labels...')
        with Pool(workers) as pool:
            infos = pool.map(_process_scene,
                             [(root, split, i) for i in ids])
        split_infos[split] = infos
        path = os.path.join(out_dir, f'kitti_infos_{split}_GGA.pkl')
        with open(path, 'wb') as f:
            pickle.dump(infos, f)
        print(f'  -> {path}')

    if 'train' in split_infos and 'val' in split_infos:
        trainval = split_infos['train'] + split_infos['val']
        path = os.path.join(out_dir, 'kitti_infos_trainval_GGA.pkl')
        with open(path, 'wb') as f:
            pickle.dump(trainval, f)
        print(f'  -> {path}')
    else:
        trainval = split_infos.get('train', [])

    print('creating reduced point clouds...')
    create_reduced_point_clouds(root, trainval)
    print('creating GGA GT database...')
    create_gga_gt_database(root, split_infos.get('train', trainval))
    print('done.')


if __name__ == '__main__':
    p = argparse.ArgumentParser()
    p.add_argument('dataset', choices=['kitti'])
    p.add_argument('--root-path', default='data/kitti')
    p.add_argument('--out-dir', default=None)
    p.add_argument('--workers', type=int, default=16)
    a = p.parse_args()
    kitti_data_prep(a.root_path, a.out_dir or a.root_path, a.workers)
