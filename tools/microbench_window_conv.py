"""Scan-slope probe: fused windowed subm conv vs the einsum path.

Measures the FULL conv (not just the gather) fwd and fwd+bwd at each
encoder stage's shape on real bench-scene neighbor maps. The gather-only
window kernel won 2.6-4.6x isolated but the integrated step REGRESSED
13.81 -> 11.78 scenes/s (the [K, C, Q] transposed einsum / cond
boundary); the fused kernel removes the gathered intermediate and the
einsum entirely, so this probe decides whether it goes to a full-step
A/B (GGA_WINDOW_CONV=1).
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
    p.add_argument('--stages', default='0,1,2,3')
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from gga_tpu.utils.env import setup_compilation_cache
    setup_compilation_cache()
    from bench import make_batch
    from gga_tpu.models.layers import flatten_nmap
    from gga_tpu.ops import sparse as sp
    from gga_tpu.ops.voxelize import hard_voxelize

    B, N = 8, 16000
    batch = make_batch(B, 20000, 500, 256)
    vox = jax.jit(jax.vmap(lambda p_, v_: hard_voxelize(
        p_, v_, voxel_size=(0.05, 0.05, 0.1),
        pc_range=(0, -40, -3, 70.4, 40, 1), max_voxels=N)))(
            jnp.asarray(batch['points']), jnp.asarray(batch['points_valid']))
    coords0 = vox['coords']
    valid0 = jnp.arange(N)[None, :] < vox['num_voxels'][:, None]
    grid0 = (41, 1600, 1408)

    def stage_maps(coords, valid, grid):
        def mk(c, v):
            st = sp.SparseTensor(jnp.zeros((c.shape[0], 1), jnp.float32),
                                 c, v, tuple(grid))
            return sp.build_neighbor_map(st)
        nmap, hit = jax.jit(jax.vmap(mk))(coords, valid)
        return flatten_nmap(nmap, hit)

    def downsample(coords, valid, grid, budget=N):
        def mk(c, v):
            st = sp.SparseTensor(jnp.zeros((c.shape[0], 1), jnp.float32),
                                 c, v, tuple(grid))
            oc, ov, og = sp.downsample_coords(st, (3, 3, 3), (2, 2, 2),
                                              (1, 1, 1), budget)
            return oc, ov
        oc, ov = jax.jit(jax.vmap(mk))(coords, valid)
        og = tuple(int((d + 2 - 3) // 2 + 1) for d in grid)
        return oc, ov, og

    stages = {0: (coords0, valid0, grid0, 16)}
    c1, v1, g1 = downsample(coords0, valid0, grid0)
    stages[1] = (c1, v1, g1, 32)
    c2, v2, g2 = downsample(c1, v1, g1)
    stages[2] = (c2, v2, g2, 64)
    c3, v3, g3 = downsample(c2, v2, g2)
    stages[3] = (c3, v3, g3, 128)

    rng = np.random.RandomState(0)

    def scan_time(fn, feats, w, k=args.k):
        times = {}
        for kk in (1, k):
            @jax.jit
            def run(f, kk=kk):
                def body(f, _):
                    out = fn(f, w)
                    return f + out * 1e-9, ()
                f, _ = jax.lax.scan(body, f, None, length=kk)
                return f
            jax.block_until_ready(run(feats))
            t0 = time.perf_counter()
            for _ in range(3):
                out = run(feats)
            jax.block_until_ready(out)
            times[kk] = (time.perf_counter() - t0) / 3
        return max((times[k] - times[1]) / (k - 1), 1e-9)

    for s in (int(x) for x in args.stages.split(',')):
        coords, valid, grid, C = stages[s]
        nmap_flat, hit_flat = stage_maps(coords, valid, grid)
        valid_flat = valid.reshape(-1)
        feats = jnp.asarray(rng.randn(B * N, C).astype(np.float32),
                            jnp.bfloat16)
        w = jnp.asarray(rng.randn(27, C, C).astype(np.float32) * 0.1)

        def base_fwd(f, w_):
            return sp.subm_conv_with_map(f, valid_flat, nmap_flat,
                                         hit_flat, w_)

        def fused_fwd(f, w_):
            return sp.subm_conv_window(f, valid_flat, nmap_flat,
                                       hit_flat, w_)

        def grad_of(fn):
            def g(f, w_):
                def loss(f_, w__):
                    o = fn(f_, w__)
                    return (o.astype(jnp.float32) ** 2).sum()
                df, = jax.grad(loss, argnums=(0,))(f, w_)
                return df
            return g

        t_bf = scan_time(base_fwd, feats, w)
        t_ff = scan_time(fused_fwd, feats, w)
        t_bg = scan_time(grad_of(base_fwd), feats, w)
        t_fg = scan_time(grad_of(fused_fwd), feats, w)
        a = base_fwd(feats, w)
        b = fused_fwd(feats, w)
        err = float(jnp.abs(a.astype(jnp.float32)
                            - b.astype(jnp.float32)).max())
        print(f'stage{s} C={C:3d}: fwd {t_bf * 1e3:7.3f} -> '
              f'{t_ff * 1e3:7.3f} ms ({t_bf / t_ff:4.2f}x) | '
              f'fwd+bwd {t_bg * 1e3:7.3f} -> {t_fg * 1e3:7.3f} ms '
              f'({t_bg / t_fg:4.2f}x) | maxerr={err:.4f}')


if __name__ == '__main__':
    main()
