"""Generic dataset preparation CLI (the reference's tools/create_data.py
surface): kitti hands off to create_data_gga, nuscenes builds info pkls
through the devkit-gated converter.

Usage:
    python tools/create_data.py nuscenes --root-path data/nuscenes \
        --out-dir data/nuscenes [--version v1.0-trainval] [--max-sweeps 10]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument('dataset', choices=['kitti', 'nuscenes'])
    p.add_argument('--root-path', required=True)
    p.add_argument('--out-dir', required=True)
    p.add_argument('--version', default='v1.0-trainval')
    p.add_argument('--max-sweeps', type=int, default=10)
    p.add_argument('--workers', type=int, default=16)
    args = p.parse_args()

    if args.dataset == 'kitti':
        from create_data_gga import kitti_data_prep
        kitti_data_prep(args.root_path, args.out_dir,
                        workers=args.workers)
    else:
        from gga_tpu.data.nuscenes_converter import create_nuscenes_infos
        create_nuscenes_infos(args.root_path, args.out_dir,
                              version=args.version,
                              max_sweeps=args.max_sweeps)


if __name__ == '__main__':
    main()
