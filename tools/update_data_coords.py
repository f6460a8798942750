"""Migrate pre-coord-refactor info/dbinfo pkls to the current coordinate
conventions (numpy rebuild of /root/reference/tools/update_data_coords.py).

The mmdet3d v1.0 coordinate refactor changed box parameterizations:
- LIDAR boxes: (w, l) swapped to (l, w) = (dx, dy) and yaw flipped
  (yaw_new = -yaw_old - pi/2, wrapped to [0, 2pi));
- Depth boxes (sunrgbd/scannet/s3dis): yaw negated.
Old pkls (kitti dbinfos, nuscenes/lyft infos+dbinfos, indoor infos)
produced by pre-refactor converters are rewritten in place or to
--out-dir.

Usage:
    python tools/update_data_coords.py kitti --root-dir data/kitti
"""
import argparse
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def _limit(val, period=2 * np.pi):
    return val - np.floor(val / period) * period


def _load(path):
    with open(path, 'rb') as f:
        return pickle.load(f)


def _dump(obj, path):
    os.makedirs(os.path.dirname(path) or '.', exist_ok=True)
    with open(path, 'wb') as f:
        pickle.dump(obj, f)
    print(f'wrote {path}')


def update_lidar_boxes(boxes):
    """[..., 7] lidar boxes: swap (w, l) -> (l, w), yaw -> -yaw - pi/2."""
    out = np.asarray(boxes).copy()
    out[..., [3, 4]] = out[..., [4, 3]]
    out[..., 6] = _limit(-np.asarray(boxes)[..., 6] - np.pi / 2)
    return out


def update_sunrgbd_infos(root, out_dir, pkl_files):
    for name in pkl_files:
        infos = _load(os.path.join(root, name))
        for item in infos:
            a = item.get('annos', {})
            if 'rotation_y' in a:
                a['rotation_y'] = -np.asarray(a['rotation_y'])
                a['gt_boxes_upright_depth'][:, -1:] = \
                    -np.asarray(a['gt_boxes_upright_depth'])[:, -1:]
        _dump(infos, os.path.join(out_dir, name))


def update_outdoor_dbinfos(root, out_dir, pkl_files):
    for name in pkl_files:
        db = _load(os.path.join(root, name))
        for cls_items in db.values():
            for item in cls_items:
                item['box3d_lidar'] = update_lidar_boxes(
                    item['box3d_lidar'])
        _dump(db, os.path.join(out_dir, name))


def update_nuscenes_or_lyft_infos(root, out_dir, pkl_files):
    for name in pkl_files:
        data = _load(os.path.join(root, name))
        for item in data['infos']:
            item['gt_boxes'] = update_lidar_boxes(item['gt_boxes'])
        _dump(data, os.path.join(out_dir, name))


def main():
    p = argparse.ArgumentParser()
    p.add_argument('dataset')
    p.add_argument('--root-dir', default='./data/kitti')
    p.add_argument('--version', default='v1.0')
    p.add_argument('--out-dir', default=None)
    args = p.parse_args()
    out = args.out_dir or args.root_dir

    if args.dataset == 'kitti':
        # kitti infos live in the CAM frame (unchanged by the refactor);
        # only the lidar-frame dbinfos migrate
        update_outdoor_dbinfos(args.root_dir, out,
                               ['kitti_dbinfos_train.pkl'])
    elif args.dataset in ('nuscenes', 'lyft'):
        names = [f'{args.dataset}_infos_val.pkl']
        if args.version != 'v1.0-mini':
            names.append(f'{args.dataset}_infos_train.pkl')
        else:
            names.append(f'{args.dataset}_infos_train.pkl')
        names = [n for n in names
                 if os.path.exists(os.path.join(args.root_dir, n))]
        update_nuscenes_or_lyft_infos(args.root_dir, out, names)
        db = f'{args.dataset}_dbinfos_train.pkl'
        if os.path.exists(os.path.join(args.root_dir, db)):
            update_outdoor_dbinfos(args.root_dir, out, [db])
    elif args.dataset in ('sunrgbd', 'scannet', 's3dis'):
        names = [n for n in os.listdir(args.root_dir)
                 if n.startswith(f'{args.dataset}_infos')
                 and n.endswith('.pkl')]
        update_sunrgbd_infos(args.root_dir, out, names)
    else:
        raise SystemExit(f'unknown dataset {args.dataset}')


if __name__ == '__main__':
    main()
