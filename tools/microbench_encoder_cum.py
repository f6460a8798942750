"""Cumulative scan-slope timing of the real SparseEncoder, truncated
after each stage.

tools/microbench_encoder.py's per-op reconstruction (~31 ms) explains
less than half of the measured whole-encoder forward (~75 ms/scene).
This bench times the genuine flax module (same submodules, same param
dtypes, B=1) stopped after stage k, so the missing time localizes to a
stage transition or to conv_out/densify.
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--k', type=int, default=8)
    p.add_argument('--stages', default='0,1,2,3,4',
                   help='comma list; 4 = full encoder incl conv_out')
    args = p.parse_args()

    import flax.linen as nn
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gga_tpu.utils.env import setup_compilation_cache
    setup_compilation_cache()

    from bench import make_batch
    from gga_tpu.models.middle_encoders import SparseEncoder
    from gga_tpu.ops import sparse as sp
    from gga_tpu.ops.voxelize import hard_voxelize

    B, P = 1, 20000
    batch_np = make_batch(B, P, 128, 256)
    pts = jnp.asarray(batch_np['points'])
    pv = jnp.asarray(batch_np['points_valid'])

    def vox_fn(p, v):
        def one(pp, vv):
            out = hard_voxelize(
                pp, vv, voxel_size=(0.05, 0.05, 0.1),
                pc_range=(0, -40, -3, 70.4, 40, 1),
                max_points=5, max_voxels=16000)
            return (out['voxels'], out['coords'], out['num_points'],
                    out['num_voxels'])
        voxels, coords, npts, nvox = jax.vmap(one)(p, v)
        feats = voxels[..., :4].sum(axis=-2) / jnp.maximum(
            npts[..., None], 1).astype(voxels.dtype)
        feats = feats.astype(jnp.bfloat16)
        vvalid = (jnp.arange(16000)[None, :] < nvox[:, None])
        return feats, coords, vvalid

    feats, coords, vvalid = jax.jit(vox_fn)(pts, pv)
    jax.block_until_ready(feats)

    class TruncEncoder(nn.Module):
        """SparseEncoder prefix: conv_input + first `n_stages` stages;
        mirrors models/middle_encoders.py:49-122 layer for layer."""
        n_stages: int   # 0..3 = stop after stage, 4 = full + conv_out

        @nn.compact
        def __call__(self, feats, coords, valid, train=True):
            from gga_tpu.models.layers import (MaskedBatchNorm,
                                               SparseBasicBlock,
                                               SparseConvBlock,
                                               SubMConv3dMapped)
            grid = (41, 1600, 1408)
            enc_ch = ((16, 16, 32), (32, 32, 64), (64, 64, 128),
                      (128, 128))
            enc_pad = ((0, 0, 1), (0, 0, 1), (0, 0, (0, 1, 1)), (0, 0))
            budgets = (16000, 14000, 12000)

            def make_map(cc, vv, g):
                st = sp.SparseTensor(
                    jnp.zeros((cc.shape[0], 1), jnp.float32), cc, vv, g)
                return sp.build_neighbor_map(st)

            nmap, hit = jax.vmap(
                lambda c, v: make_map(c, v, grid))(coords, valid)
            x = SubMConv3dMapped(16)(feats, valid, nmap, hit)
            x = MaskedBatchNorm()(x, valid, train)
            x = nn.relu(x)
            c, v, g = coords, valid, grid
            for i, blocks in enumerate(enc_ch):
                if i >= max(self.n_stages, 1) and i > 0:
                    break
                for j, out_ch in enumerate(blocks):
                    pad = enc_pad[i][j]
                    pad3 = tuple(pad) if isinstance(pad, (tuple, list)) \
                        else (pad,) * 3
                    is_down = (j == len(blocks) - 1) and (i != 3)
                    if is_down:
                        if i + 1 > self.n_stages:
                            break
                        x, c, v, g = SparseConvBlock(
                            out_ch, 'spconv', kernel_size=(3, 3, 3),
                            stride=(2, 2, 2), padding=pad3,
                            out_budget=budgets[i])(x, c, v, g, train)
                        nmap, hit = jax.vmap(
                            lambda cc, vv, gg=g: make_map(cc, vv, gg))(
                            c, v)
                    else:
                        x = SparseBasicBlock(out_ch)(x, c, v, g, train,
                                                     nmap=nmap, hit=hit)
            if self.n_stages >= 4:
                x, c, v, g = SparseConvBlock(
                    128, 'spconv', kernel_size=(3, 1, 1),
                    stride=(2, 1, 1), padding=(0, 0, 0),
                    out_budget=12000)(x, c, v, g, train)
                nz, ny, nx = g

                def densify(f, cc, vv):
                    z = jnp.where(vv, cc[:, 0], nz)
                    y = jnp.where(vv, cc[:, 1], 0)
                    xx = jnp.where(vv, cc[:, 2], 0)
                    dense = jnp.zeros((nz + 1, ny, nx, f.shape[-1]),
                                      f.dtype)
                    return dense.at[z, y, xx].set(
                        jnp.where(vv[:, None], f, 0))[:nz]
                return jax.vmap(densify)(x, c, v)
            return x

    for ns in [int(s) for s in args.stages.split(',')]:
        enc = TruncEncoder(ns)
        vars_ = enc.init(jax.random.PRNGKey(0), feats, coords, vvalid,
                         train=False)
        vars_ = jax.device_put(vars_)

        def f(cc, enc=enc, vars_=vars_):
            ff = feats + jnp.minimum(cc, 0).astype(feats.dtype)
            out, _ = enc.apply(vars_, ff, coords, vvalid, train=True,
                               mutable=['batch_stats'])
            return jnp.minimum(out.sum(), 0).astype(feats.dtype)

        times = {}
        for k in (1, args.k):
            @jax.jit
            def run(c, k=k):
                def body(c, _):
                    return f(c), ()
                c, _ = jax.lax.scan(body, c, None, length=k)
                return c
            out = run(jnp.zeros((), jnp.bfloat16))
            jax.block_until_ready(out)
            t0 = time.perf_counter()
            for _ in range(5):
                out = run(jnp.zeros((), jnp.bfloat16))
            jax.block_until_ready(out)
            times[k] = (time.perf_counter() - t0) / 5
        dt = (times[args.k] - times[1]) / (args.k - 1)
        print(f'stages<= {ns}: {dt * 1e3:9.3f} ms')


if __name__ == '__main__':
    main()
