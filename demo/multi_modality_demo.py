"""Multi-modality (points + image) detection demo.

Equivalent of /root/reference/demo/multi_modality_demo.py: load a
velodyne .bin + camera image + calib, run an MVXNet-style fusion
detector, save BEV + projected-box visualizations.

Usage:
    python demo/multi_modality_demo.py PCD IMG CALIB CKPT_DIR [--out-dir d]
    python demo/multi_modality_demo.py --synthetic    # fixture smoke run
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument('pcd', nargs='?', help='velodyne .bin file')
    p.add_argument('image', nargs='?')
    p.add_argument('calib', nargs='?',
                   help='KITTI calib txt or json (lidar2img)')
    p.add_argument('checkpoint', nargs='?')
    p.add_argument('--out-dir', default='demo_out')
    p.add_argument('--score-thr', type=float, default=0.3)
    p.add_argument('--synthetic', action='store_true',
                   help='run on a generated fixture (no files needed)')
    p.add_argument('--cpu', action='store_true',
                   help='force the CPU backend (sitecustomize pins the '
                        'axon TPU platform; JAX_PLATFORMS env is ignored)')
    args = p.parse_args()

    import jax
    if args.cpu:
        jax.config.update('jax_platforms', 'cpu')
    import numpy as np

    from gga_tpu.apis import inference_multi_modality_detector
    from gga_tpu.core.visualizer import show_result
    from gga_tpu.models.detectors.mvxnet import MVXNet, MVXNetConfig

    if args.synthetic:
        cfg = MVXNetConfig.tiny()
        h, w, P = 64, 96, 128
        rng = np.random.RandomState(0)
        points = (rng.rand(256, 4).astype(np.float32)
                  * np.asarray([20, 20, 4, 1], np.float32))
        img = rng.rand(h, w, 3).astype(np.float32)
        lidar2img = np.eye(4, dtype=np.float32)
        name = 'synthetic'
    else:
        if not (args.pcd and args.image and args.calib):
            p.error('pcd, image and calib are required without '
                    '--synthetic')
        cfg = MVXNetConfig()
        P = 16384
        points = np.fromfile(args.pcd, np.float32).reshape(-1, 4)
        from PIL import Image
        img = np.asarray(Image.open(args.image).convert('RGB'),
                         np.float32) / 255.0
        from demo.mono_det_demo import load_cam2img
        cam2img = load_cam2img(args.calib)
        # KITTI lidar2img = P2 @ R0_rect @ Tr_velo_to_cam; a json calib
        # may carry lidar2img directly
        lidar2img = cam2img  # json path: cam2img key holds lidar2img
        name = os.path.splitext(os.path.basename(args.pcd))[0]

    model = MVXNet(cfg)
    variables = model.init(
        jax.random.PRNGKey(0), points[None, :P // 2],
        np.ones((1, P // 2), bool), img[None], lidar2img[None],
        train=False)
    if args.checkpoint:
        from gga_tpu.train.checkpoints import load_variables
        variables = load_variables(args.checkpoint, variables)

    out = inference_multi_modality_detector(
        model, cfg, variables, points, img, lidar2img, max_points=P)
    keep = out['scores_3d'] > args.score_thr
    boxes = out['boxes_3d'][keep]
    print(f'{int(keep.sum())} detections above {args.score_thr}')

    out_file = show_result(points, None, boxes, args.out_dir,
                           f'{name}_multi_modality')
    print(f'visualization -> {out_file}')


if __name__ == '__main__':
    main()
