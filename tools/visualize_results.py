"""Render saved detection results as BEV images (equivalent of
/root/reference/tools/misc/visualize_results.py).

Usage:
    python tools/visualize_results.py configs/gga/gga_kitti.py \
        --results results.pkl --out-dir work_dirs/vis [--num 10]
"""
import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument('config')
    p.add_argument('--results', required=True,
                   help='pkl list of dicts(boxes_3d, scores_3d, labels_3d)')
    p.add_argument('--out-dir', default='./work_dirs/vis')
    p.add_argument('--num', type=int, default=10)
    p.add_argument('--score-thr', type=float, default=0.1)
    p.add_argument('--cfg-options', nargs='*', default=[])
    args = p.parse_args()

    import numpy as np

    from gga_tpu.config import Config
    from gga_tpu.core.visualizer import show_bev_result
    from gga_tpu.data import pipelines as pl
    from gga_tpu.tools_lib import load_infos

    cfg = Config.fromfile(args.config)
    cfg.merge_from_options(
        dict(kv.split('=', 1) for kv in args.cfg_options))
    with open(args.results, 'rb') as f:
        results = pickle.load(f)
    infos = load_infos(cfg, cfg.data.train_info)
    os.makedirs(args.out_dir, exist_ok=True)
    for i in range(min(args.num, len(results), len(infos))):
        s = pl.load_sample(infos[i], cfg.data_root,
                           pts_prefix=cfg.data.pts_prefix)
        det = results[i]
        keep = np.asarray(det['scores_3d']) >= args.score_thr
        out = os.path.join(args.out_dir, f'result_{i:06d}.png')
        show_bev_result(s['points'],
                        pred_boxes=np.asarray(det['boxes_3d'])[keep],
                        out_file=out)
        print(f'-> {out}')


if __name__ == '__main__':
    main()
