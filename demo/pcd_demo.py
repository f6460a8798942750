"""Point-cloud inference demo.

Equivalent of /root/reference/demo/pcd_demo.py: load a velodyne .bin, run
the GGA detector, save a BEV visualization.

Usage:
    python demo/pcd_demo.py PCD CONFIG CHECKPOINT_DIR [--out-dir demo_out]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument('pcd', help='velodyne .bin file')
    p.add_argument('config')
    p.add_argument('checkpoint')
    p.add_argument('--out-dir', default='demo_out')
    p.add_argument('--score-thr', type=float, default=0.3)
    args = p.parse_args()

    import numpy as np

    from gga_tpu.apis import inference_detector, init_model
    from gga_tpu.core.visualizer import show_result

    bundle = init_model(args.config, args.checkpoint)
    points = np.fromfile(args.pcd, np.float32).reshape(-1, 4)
    result = inference_detector(bundle, points)
    keep = result['scores_3d'] > args.score_thr
    boxes = result['boxes_3d'][keep]
    print(f'{keep.sum()} detections above {args.score_thr}')
    name = os.path.splitext(os.path.basename(args.pcd))[0]
    out = show_result(points, None, boxes, args.out_dir, name)
    print(f'visualization -> {out}')


if __name__ == '__main__':
    main()
