"""Monocular 3D detection demo.

Equivalent of /root/reference/demo/mono_det_demo.py: load an image + a
KITTI-format calib (or annotation json with cam intrinsics), run a
monocular detector (SMOKE), and save a projected-box visualization.

Usage:
    python demo/mono_det_demo.py IMG CALIB CHECKPOINT_DIR [--out-dir d]
    python demo/mono_det_demo.py --synthetic          # fixture smoke run
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def load_cam2img(path):
    """cam2img [4, 4] from a json ({'cam2img' | 'cam_intrinsic'}) or a
    KITTI calib txt (P2 row)."""
    import numpy as np
    if path.endswith('.json'):
        with open(path) as f:
            d = json.load(f)
        k = np.asarray(d.get('cam2img', d.get('cam_intrinsic')),
                       np.float32)
    else:
        with open(path) as f:
            lines = {l.split(':')[0].strip(): l.split(':', 1)[1]
                     for l in f if ':' in l}
        k = np.fromstring(lines['P2'], sep=' ',
                          dtype=np.float32).reshape(3, 4)
    out = np.eye(4, dtype=np.float32)
    out[:k.shape[0], :k.shape[1]] = k
    return out


def build_model(checkpoint, synthetic):
    import jax
    import numpy as np

    from gga_tpu.models.detectors.smoke import (SMOKEDetector,
                                                SMOKEModelConfig)
    cfg = SMOKEModelConfig.tiny() if synthetic else SMOKEModelConfig()
    model = SMOKEDetector(cfg)
    h, w = (64, 96) if synthetic else (384, 1280)
    variables = model.init(jax.random.PRNGKey(0),
                           np.zeros((1, h, w, 3), np.float32),
                           train=False)
    if checkpoint:
        from gga_tpu.train.checkpoints import load_variables
        variables = load_variables(checkpoint, variables)
    return model, cfg, variables, (h, w)


def main():
    p = argparse.ArgumentParser()
    p.add_argument('image', nargs='?', help='input image (png/jpg)')
    p.add_argument('calib', nargs='?',
                   help='KITTI calib txt or json with cam2img')
    p.add_argument('checkpoint', nargs='?', help='orbax checkpoint dir')
    p.add_argument('--out-dir', default='demo_out')
    p.add_argument('--score-thr', type=float, default=0.25)
    p.add_argument('--synthetic', action='store_true',
                   help='run on a generated fixture (no files needed)')
    p.add_argument('--cpu', action='store_true',
                   help='force the CPU backend (sitecustomize pins the '
                        'axon TPU platform; JAX_PLATFORMS env is ignored)')
    args = p.parse_args()

    if args.cpu:
        import jax
        jax.config.update('jax_platforms', 'cpu')
    import numpy as np

    from gga_tpu.apis import inference_mono_3d_detector
    from gga_tpu.core.visualizer import show_multi_modality_result

    model, cfg, variables, (h, w) = build_model(args.checkpoint,
                                                args.synthetic)
    if args.synthetic:
        rng = np.random.RandomState(0)
        img = rng.rand(h, w, 3).astype(np.float32)
        cam2img = np.eye(4, dtype=np.float32)
        cam2img[0, 0] = cam2img[1, 1] = 60.0
        cam2img[0, 2], cam2img[1, 2] = w / 2, h / 2
        name = 'synthetic'
    else:
        if not (args.image and args.calib):
            p.error('image and calib are required without --synthetic')
        from PIL import Image
        img = np.asarray(Image.open(args.image).convert('RGB'),
                         np.float32) / 255.0
        cam2img = load_cam2img(args.calib)
        name = os.path.splitext(os.path.basename(args.image))[0]

    # SMOKE decode takes (cam2img, trans_mat): feature->image affine
    import types
    trans = np.diag([img.shape[1] / (img.shape[1] // 4),
                     img.shape[0] / (img.shape[0] // 4),
                     1.0]).astype(np.float32)
    m = types.SimpleNamespace(
        apply=model.apply,
        decode=lambda preds, k: model.decode(preds, k, trans[None]))
    out = inference_mono_3d_detector(m, cfg, variables, img, cam2img)
    keep = out['scores_3d'] > args.score_thr
    print(f'{int(keep.sum())} detections above {args.score_thr}')

    os.makedirs(args.out_dir, exist_ok=True)
    out_file = os.path.join(args.out_dir, f'{name}_mono_det.png')
    show_multi_modality_result((img * 255).astype(np.uint8),
                               out['boxes_3d'][keep], cam2img,
                               out_file=out_file)
    print(f'visualization -> {out_file}')


if __name__ == '__main__':
    main()
