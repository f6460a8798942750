"""FLOPs/params report via XLA cost analysis.

Equivalent of /root/reference/tools/analysis_tools/get_flops.py, but
instead of hook-based torch FLOP counting it asks the compiler:
``jit(forward).lower(...).compile().cost_analysis()`` returns the exact
HLO flop/byte counts for the compiled program.

Usage:
    python tools/get_flops.py configs/second/hv_second_secfpn_6x8_80e_kitti-3d-3class.py \
        [--points 16384] [--batch 1] [--tiny]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument('config')
    p.add_argument('--points', type=int, default=16384)
    p.add_argument('--batch', type=int, default=1)
    p.add_argument('--cpu', action='store_true')
    args = p.parse_args()

    import jax
    if args.cpu:
        jax.config.update('jax_platforms', 'cpu')
    import jax.numpy as jnp
    import numpy as np

    from gga_tpu.config import Config
    from gga_tpu.models.builder import build_detector
    from gga_tpu.utils.env import setup_compilation_cache

    setup_compilation_cache()
    cfg = Config.fromfile(args.config)
    model, model_cfg = build_detector(cfg)

    pts = jnp.zeros((args.batch, args.points, 4), jnp.float32)
    val = jnp.ones((args.batch, args.points), bool)
    variables = model.init(jax.random.PRNGKey(0), pts, val, train=False)
    n_params = sum(np.prod(x.shape) for x in
                   jax.tree_util.tree_leaves(variables['params']))

    fwd = jax.jit(lambda v, p, m: model.apply(v, p, m, train=False))
    cost = fwd.lower(variables, pts, val).compile().cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    flops = cost.get('flops', float('nan'))
    bytes_ = cost.get('bytes accessed', float('nan'))
    print(f'model: {cfg.model.type}')
    print(f'input: [{args.batch}, {args.points}, 4] points')
    print(f'params: {n_params / 1e6:.2f} M')
    print(f'forward flops: {flops / 1e9:.2f} GFLOPs')
    print(f'hbm bytes accessed: {bytes_ / 1e9:.3f} GB')


if __name__ == '__main__':
    main()
