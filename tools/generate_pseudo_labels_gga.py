"""Stage 3: pseudo-3D-label generation.

Equivalent of /root/reference/tools/generate_pseudo_labels_gga.py +
KittiDataset_GGA_match.evaluate (kitti_dataset_GGA_match.py:421): run
inference over the trainval split, convert to KITTI annos, match against
the 2D GT by image-plane IoU, dump the pseudo info pkl, and report KITTI AP
against the (debug-only) 3D GT.

Usage:
    python tools/generate_pseudo_labels_gga.py \
        configs/gga/gga_kitti_matching.py \
        --checkpoint work_dirs/kitti_GGA/checkpoints [--eval]

The matching config names the split + pseudo-pkl destination
(``matching = dict(info=..., out=...)``); ``--out`` overrides.
"""
import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument('config')
    p.add_argument('--checkpoint', required=True)
    p.add_argument('--out', default=None)
    p.add_argument('--eval', action='store_true',
                   help='also report KITTI AP vs the 3D GT (debug)')
    p.add_argument('--batch-size', type=int, default=None)
    p.add_argument('--tmpdir', default=None,
                   help='shared dir for multi-process result collect '
                        '(the reference multi_gpu_test tmpdir '
                        'mechanism); default work-dir local')
    p.add_argument('--rank', type=int, default=None,
                   help='override process rank (defaults to '
                        'jax.process_index())')
    p.add_argument('--world', type=int, default=None,
                   help='override process count')
    p.add_argument('--cfg-options', nargs='*', default=[])
    return p.parse_args()


def main():
    args = parse_args()
    import jax
    import numpy as np

    from gga_tpu.config import Config
    from gga_tpu.data.kitti.pseudo_labels import pseudo_label_matching
    from gga_tpu.eval.kitti_eval import kitti_eval
    from gga_tpu.eval.submission import detections_to_kitti_annos
    from gga_tpu.parallel.dist_eval import run_sharded_inference
    from gga_tpu.tools_lib import build_model_from_cfg
    from gga_tpu.utils.env import setup_compilation_cache

    setup_compilation_cache()
    cfg = Config.fromfile(args.config)
    cfg.merge_from_options(
        dict(kv.split('=', 1) for kv in args.cfg_options))

    model, model_cfg, state = build_model_from_cfg(cfg, args.checkpoint)
    # the matching config (configs/gga/gga_kitti_matching.py) names the
    # split to run over + the pseudo-pkl destination; a plain training
    # config falls back to its train info
    matching = cfg.get('matching', {})
    info_path = os.path.join(cfg.data_root,
                             matching.get('info', cfg.data.train_info))
    with open(info_path, 'rb') as f:
        infos = pickle.load(f)

    bs = args.batch_size or cfg.data.samples_per_gpu * len(jax.devices())
    tmpdir = args.tmpdir or os.path.join(
        cfg.get('work_dir') or './work_dirs/kitti_GGA', 'eval_parts')
    detections = run_sharded_inference(
        model, model_cfg, state, cfg, infos, bs, tmpdir,
        rank=args.rank, world=args.world)
    if detections is None:
        print('non-zero rank: shard dumped, exiting '
              '(rank 0 merges and matches)')
        return
    det_annos = detections_to_kitti_annos(
        detections, infos, class_names=('Pedestrian', 'Cyclist', 'Car'))

    out = args.out or matching.get('out') or os.path.join(
        cfg.data_root, '..', 'kitti_pseudo',
        'kitti_infos_trainval_GGA_pseudo.pkl')
    pseudo_infos, gt_annos = pseudo_label_matching(infos, det_annos,
                                                   out_path=out)
    print(f'pseudo infos -> {out}')

    if args.eval:
        result, ret = kitti_eval(gt_annos, det_annos,
                                 ['Pedestrian', 'Cyclist', 'Car'])
        print(result)
        mod = np.mean([ret.get(f'KITTI/{c}_3D_AP11_moderate_strict', 0.0)
                       for c in ('Car',)])
        print(f'Car 3D AP11 moderate: {mod:.2f}')


if __name__ == '__main__':
    main()
