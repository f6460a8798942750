"""Generic dataset preparation CLI (the reference's tools/create_data.py
surface): kitti hands off to create_data_gga, nuscenes builds info pkls
through the devkit-gated converter, the indoor datasets (sunrgbd,
scannet, s3dis) convert the community-preprocessed raw layouts, waymo
(kitti-format) and lyft build info pkls from their raw trees.

Usage:
    python tools/create_data.py nuscenes --root-path data/nuscenes \
        --out-dir data/nuscenes [--version v1.0-trainval] [--max-sweeps 10]
    python tools/create_data.py sunrgbd --root-path data/sunrgbd \
        --out-dir data/sunrgbd
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument('dataset', choices=['kitti', 'nuscenes', 'sunrgbd',
                                       'scannet', 's3dis', 'waymo',
                                       'lyft', 'nuimages'])
    p.add_argument('--root-path', required=True)
    p.add_argument('--out-dir', required=True)
    p.add_argument('--version', default='v1.0-trainval')
    p.add_argument('--max-sweeps', type=int, default=10)
    p.add_argument('--workers', type=int, default=16)
    p.add_argument('--num-points', type=int, default=-1,
                   help='sunrgbd: subsample each depth cloud (-1 = all)')
    p.add_argument('--use-v1', action='store_true',
                   help='sunrgbd: use the v1 label set')
    args = p.parse_args()

    if args.dataset == 'kitti':
        from create_data_gga import kitti_data_prep
        kitti_data_prep(args.root_path, args.out_dir,
                        workers=args.workers)
    elif args.dataset == 'nuscenes':
        from gga_tpu.data.nuscenes_converter import create_nuscenes_infos
        create_nuscenes_infos(args.root_path, args.out_dir,
                              version=args.version,
                              max_sweeps=args.max_sweeps)
    elif args.dataset == 'sunrgbd':
        from gga_tpu.data.indoor_converter import create_sunrgbd_infos
        create_sunrgbd_infos(args.root_path, args.out_dir,
                             workers=args.workers,
                             num_points=args.num_points,
                             use_v1=args.use_v1)
    elif args.dataset == 'scannet':
        from gga_tpu.data.indoor_converter import create_scannet_infos
        create_scannet_infos(args.root_path, args.out_dir,
                             workers=args.workers)
    elif args.dataset == 's3dis':
        from gga_tpu.data.indoor_converter import create_s3dis_infos
        create_s3dis_infos(args.root_path, args.out_dir,
                           workers=args.workers)
    elif args.dataset == 'waymo':
        from gga_tpu.data.waymo_converter import create_waymo_infos
        create_waymo_infos(args.root_path, args.out_dir,
                           workers=args.workers,
                           max_sweeps=args.max_sweeps)
    elif args.dataset == 'lyft':
        from gga_tpu.data.lyft_converter import create_lyft_infos
        create_lyft_infos(args.root_path, args.out_dir,
                          version=args.version,
                          max_sweeps=args.max_sweeps)
    elif args.dataset == 'nuimages':
        from gga_tpu.data.nuimage_converter import export_nuim_to_coco
        export_nuim_to_coco(args.root_path, args.out_dir,
                            version=args.version)


if __name__ == '__main__':
    main()
