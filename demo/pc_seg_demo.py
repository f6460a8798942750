"""Point-cloud semantic segmentation demo.

Equivalent of /root/reference/demo/pc_seg_demo.py: load a point cloud,
run a PointNet2 EncoderDecoder3D segmentor, save a BEV visualization
colored by predicted class.

Usage:
    python demo/pc_seg_demo.py PCD CHECKPOINT_DIR [--out-dir d]
    python demo/pc_seg_demo.py --synthetic      # fixture smoke run
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument('pcd', nargs='?',
                   help='.bin float32 cloud ([N, 6] xyzrgb or [N, 4])')
    p.add_argument('checkpoint', nargs='?')
    p.add_argument('--out-dir', default='demo_out')
    p.add_argument('--num-classes', type=int, default=13)
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

    from gga_tpu.apis import inference_segmentor
    from gga_tpu.models.segmentors.encoder_decoder import (
        EncoderDecoder3D, EncoderDecoder3DConfig)

    if args.synthetic:
        cfg = EncoderDecoder3DConfig(
            num_classes=5, in_channels=6, num_points=(64, 16, 8, 4),
            sa_channels=((8, 8),) * 4,
            fp_channels=((8,), (8,), (8,), (8,)), head_channels=8)
        rng = np.random.RandomState(0)
        points = rng.rand(200, 6).astype(np.float32)
        max_points = 128
        name = 'synthetic'
    else:
        if not args.pcd:
            p.error('pcd is required without --synthetic')
        cfg = EncoderDecoder3DConfig(num_classes=args.num_classes,
                                     in_channels=6)
        raw = np.fromfile(args.pcd, np.float32)
        dim = 6 if raw.size % 6 == 0 else 4
        points = raw.reshape(-1, dim)
        if dim == 4:  # pad xyz+intensity to xyzrgb-shaped features
            points = np.concatenate(
                [points[:, :3], np.tile(points[:, 3:4], (1, 3))], 1)
        max_points = 40000
        name = os.path.splitext(os.path.basename(args.pcd))[0]

    model = EncoderDecoder3D(cfg)
    pad = np.zeros((1, max_points, points.shape[1]), np.float32)
    n0 = min(len(points), max_points)
    pad[0, :n0] = points[:n0]
    val = np.zeros((1, max_points), bool)
    val[0, :n0] = True
    variables = model.init(jax.random.PRNGKey(0), pad, val, train=False)
    if args.checkpoint:
        from gga_tpu.train.checkpoints import load_variables
        variables = load_variables(args.checkpoint, variables)

    labels = inference_segmentor(model, variables, points,
                                 max_points=max_points)
    n = len(labels)
    uniq, counts = np.unique(labels, return_counts=True)
    print('predicted class histogram:',
          dict(zip(uniq.tolist(), counts.tolist())))

    # BEV scatter colored by class
    os.makedirs(args.out_dir, exist_ok=True)
    out_file = os.path.join(args.out_dir, f'{name}_seg_bev.png')
    import matplotlib
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt
    fig, ax = plt.subplots(figsize=(8, 8))
    ax.scatter(points[:n, 0], points[:n, 1], c=labels, s=1,
               cmap='tab20', vmin=0, vmax=max(cfg.num_classes - 1, 1))
    ax.set_aspect('equal')
    ax.set_title(f'{name}: predicted semantic classes (BEV)')
    fig.savefig(out_file, dpi=120, bbox_inches='tight')
    plt.close(fig)
    print(f'visualization -> {out_file}')


if __name__ == '__main__':
    main()
