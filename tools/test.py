"""Evaluation / submission tool.

Equivalent of /root/reference/tools/test.py: run inference on a split,
report KITTI AP and/or write submission txt files.

Usage:
    python tools/test.py configs/gga/gga_kitti.py \
        --checkpoint work_dirs/kitti_GGA/checkpoints \
        [--info kitti_infos_val_GGA.pkl] [--eval] \
        [--format-only --submission-dir out/]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument('config')
    p.add_argument('--checkpoint', required=True)
    p.add_argument('--info', default=None,
                   help='info pkl name under data_root')
    p.add_argument('--eval', action='store_true')
    p.add_argument('--format-only', action='store_true')
    p.add_argument('--submission-dir', default=None)
    p.add_argument('--batch-size', type=int, default=None)
    p.add_argument('--aug-test', action='store_true',
                   help='multi-scale + flip TTA (MultiScaleFlipAug3D '
                        'equivalent; slower, per-scene)')
    p.add_argument('--cfg-options', nargs='*', default=[])
    return p.parse_args()


def main():
    args = parse_args()
    from train import init_multihost
    init_multihost()
    import jax

    from gga_tpu.config import Config
    from gga_tpu.eval.kitti_eval import kitti_eval
    from gga_tpu.eval.submission import (detections_to_kitti_annos,
                                         write_kitti_submission)
    from gga_tpu.tools_lib import (build_model_from_cfg, load_infos,
                                   run_inference)
    from gga_tpu.utils.env import setup_compilation_cache

    setup_compilation_cache()
    cfg = Config.fromfile(args.config)
    cfg.merge_from_options(
        dict(kv.split('=', 1) for kv in args.cfg_options))
    model, model_cfg, state = build_model_from_cfg(cfg, args.checkpoint)
    infos = load_infos(cfg, args.info or cfg.data.train_info)

    bs = args.batch_size or cfg.data.samples_per_gpu * len(jax.devices())
    if args.aug_test:
        from gga_tpu.apis import aug_inference_detector
        from gga_tpu.data import pipelines as pl
        bundle = (model, model_cfg, state, cfg)
        detections = []
        for i, info in enumerate(infos):
            s = pl.load_sample(info, cfg.data_root,
                               pts_prefix=cfg.data.pts_prefix)
            det = aug_inference_detector(bundle, s['points'])
            detections.append(det)
            if i % 50 == 0:
                print(f'  aug-test {i + 1}/{len(infos)}')
    else:
        detections = run_inference(model, model_cfg, state, cfg, infos,
                                   bs)
    det_annos = detections_to_kitti_annos(
        detections, infos, class_names=('Pedestrian', 'Cyclist', 'Car'))

    if args.format_only or args.submission_dir:
        out = args.submission_dir or 'submission'
        write_kitti_submission(det_annos, infos, out)
        print(f'submission files -> {out}')
    if args.eval:
        gt_annos = [info['annos'] for info in infos]
        result, ret = kitti_eval(gt_annos, det_annos,
                                 ['Pedestrian', 'Cyclist', 'Car'])
        print(result)


if __name__ == '__main__':
    main()
