"""Inference FPS benchmark.

Equivalent of /root/reference/tools/analysis_tools/benchmark.py:31 (FPS
over N samples with warmup skip) for the GGA detector on TPU, using
synthetic KITTI-shaped clouds.

Usage:
    python tools/benchmark.py [--samples 200] [--batch-size 8] [--tiny]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--samples', type=int, default=200)
    p.add_argument('--warmup', type=int, default=2)
    p.add_argument('--batch-size', type=int, default=8)
    p.add_argument('--points', type=int, default=20000)
    p.add_argument('--tiny', action='store_true')
    p.add_argument('--profile-dir', default=None,
                   help='write a jax.profiler trace here')
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from gga_tpu.models.detectors.centerpoint_gga import (
        GGAModelConfig, GGADetector, decode_detections)
    from gga_tpu.utils.env import setup_compilation_cache

    setup_compilation_cache()
    cfg = GGAModelConfig.tiny() if args.tiny else GGAModelConfig()
    model = GGADetector(cfg)
    rng = np.random.RandomState(0)
    B, P = args.batch_size, args.points
    x = rng.uniform(0, 70.4, (B, P, 1))
    y = rng.uniform(-0.45, 0.45, (B, P, 1)) * (x + 8)
    pts = np.concatenate(
        [x, y, rng.uniform(-2.5, 0.5, (B, P, 1)), rng.rand(B, P, 1)],
        -1).astype(np.float32)
    valid = np.ones((B, P), bool)
    variables = jax.device_put(model.init(
        jax.random.PRNGKey(0), pts[:1], valid[:1], train=False))

    @jax.jit
    def infer(vv, p, v):
        preds = model.apply(vv, p, v, train=False)
        return decode_detections(cfg, preds)

    pts_j, valid_j = jnp.asarray(pts), jnp.asarray(valid)
    out = infer(variables, pts_j, valid_j)
    jax.block_until_ready(out['scores'])

    if args.profile_dir:
        jax.profiler.start_trace(args.profile_dir)

    iters = max(args.samples // B, 1)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = infer(variables, pts_j, valid_j)
    jax.block_until_ready(out['scores'])
    dt = time.perf_counter() - t0

    if args.profile_dir:
        jax.profiler.stop_trace()
        print(f'trace -> {args.profile_dir}')

    fps = B * iters / dt
    print(f'inference: {fps:.1f} samples/s '
          f'({dt / iters * 1000:.1f} ms / batch of {B})')


if __name__ == '__main__':
    main()
