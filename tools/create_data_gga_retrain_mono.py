"""Stage-4 data prep: export mono3D COCO jsons from the pseudo-info pkls.

CLI parity with /root/reference/tools/create_data_gga_retrain_mono.py:
after stage 3 has written ``kitti_infos_trainval_GGA_pseudo.pkl`` (see
tools/generate_pseudo_labels_gga.py), this exports the
``*_mono3d.coco.json`` files the PGD retrain configs consume
(configs/gga/gga_pdg.py), for both the pseudo trainval split and the
test split.
"""
import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from gga_tpu.data.kitti.mono_export import export_mono3d_coco  # noqa: E402


def export_for(info_path):
    if not os.path.exists(info_path):
        print(f'skip (missing): {info_path}')
        return
    with open(info_path, 'rb') as f:
        infos = pickle.load(f)
    out = info_path.replace('.pkl', '_mono3d.coco.json')
    export_mono3d_coco(infos, out)
    print(f'wrote {out} ({len(infos)} images)')


def main():
    p = argparse.ArgumentParser(
        description='GGA stage-4 mono3d annotation export')
    p.add_argument('dataset', choices=['kitti'],
                   help='dataset name (kitti)')
    p.add_argument('--root-path', default='./data/kitti')
    p.add_argument('--out-dir', default=None,
                   help='unused; jsons are written next to the pkls '
                        '(reference behavior)')
    p.add_argument('--extra-tag', default='kitti',
                   help='info filename prefix')
    args = p.parse_args()

    root = args.root_path
    export_for(os.path.join(
        root, f'{args.extra_tag}_infos_trainval_GGA_pseudo.pkl'))
    export_for(os.path.join(root, f'{args.extra_tag}_infos_test.pkl'))


if __name__ == '__main__':
    main()
