"""Render dataset samples as BEV images (equivalent of
/root/reference/tools/misc/browse_dataset.py).

Usage:
    python tools/browse_dataset.py configs/gga/gga_kitti.py \
        --out-dir work_dirs/browse [--num 10]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument('config')
    p.add_argument('--out-dir', default='./work_dirs/browse')
    p.add_argument('--num', type=int, default=10)
    p.add_argument('--cfg-options', nargs='*', default=[])
    args = p.parse_args()

    import numpy as np

    from gga_tpu.config import Config
    from gga_tpu.core.visualizer import show_bev_result
    from gga_tpu.data.dataset import KittiGGADataset

    cfg = Config.fromfile(args.config)
    cfg.merge_from_options(
        dict(kv.split('=', 1) for kv in args.cfg_options))
    d = cfg.data
    ds = KittiGGADataset(
        cfg.data_root, os.path.join(cfg.data_root, d.train_info),
        pc_range=cfg.point_cloud_range, max_points=d.max_points,
        max_objs=cfg.head.max_objs, max_cluster_pts=d.max_cluster_pts,
        pts_prefix=d.pts_prefix)
    os.makedirs(args.out_dir, exist_ok=True)
    for i in range(min(args.num, len(ds))):
        s = ds.get_sample(i)
        pts = s['points'][s['points_valid']] \
            if 'points_valid' in s else s['points']
        boxes = np.asarray(s['init_pseudo'])[np.asarray(s['obj_valid'])] \
            if 'init_pseudo' in s else None
        out = os.path.join(args.out_dir, f'scene_{i:06d}.png')
        show_bev_result(pts, gt_boxes=boxes, out_file=out)
        print(f'-> {out}')


if __name__ == '__main__':
    main()
