"""Scan-slope probe: windowed one-hot Pallas gather vs the XLA row gather.

Uses REAL neighbor maps built from bench-like scenes (batch-flat, B=8,
N=16000 per scene) at each encoder stage's channel width — the map's
monotone/sparse structure is exactly what the kernel exploits, so random
indices would mis-measure it. Nothing lands in the engine unless this
wins AND the full train step confirms (integration effects flip wins —
see the x-triple history in CLAUDE.md).
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--k', type=int, default=8, help='scan length')
    p.add_argument('--stages', default='0,1')
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from gga_tpu.utils.env import setup_compilation_cache
    setup_compilation_cache()
    from bench import make_batch
    from gga_tpu.models.layers import flatten_nmap
    from gga_tpu.ops import sparse as sp
    from gga_tpu.ops.pallas import window_gather as wg
    from gga_tpu.ops.voxelize import hard_voxelize

    B, N = 8, 16000
    batch = make_batch(B, 20000, 500, 256)
    vox = jax.jit(jax.vmap(lambda p_, v_: hard_voxelize(
        p_, v_, voxel_size=(0.05, 0.05, 0.1),
        pc_range=(0, -40, -3, 70.4, 40, 1), max_voxels=N)))(
            jnp.asarray(batch['points']), jnp.asarray(batch['points_valid']))
    coords0 = vox['coords']
    nvox = vox['num_voxels']
    valid0 = jnp.arange(N)[None, :] < nvox[:, None]
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

    def scan_time(fn, feats, k=args.k):
        def k_steps(kk):
            @jax.jit
            def run(f):
                def body(f, _):
                    out = fn(f)
                    # fold the output back so nothing is DCE'd/hoisted
                    return f + out[0, :, :f.shape[0]].T * 1e-9, ()
                f, _ = jax.lax.scan(body, f, None, length=kk)
                return f
            return run
        times = {}
        for kk in (1, args.k):
            f = k_steps(kk)
            jax.block_until_ready(f(feats))
            t0 = time.perf_counter()
            for _ in range(3):
                out = f(feats)
            jax.block_until_ready(out)
            times[kk] = (time.perf_counter() - t0) / 3
        return max((times[args.k] - times[1]) / (args.k - 1), 1e-9)

    for s in (int(x) for x in args.stages.split(',')):
        coords, valid, grid, C = stages[s]
        nmap_flat, hit_flat = stage_maps(coords, valid, grid)
        feats = jnp.asarray(rng.randn(B * N, C).astype(np.float32),
                            jnp.bfloat16)
        K, Q = nmap_flat.shape
        hits = int(jnp.sum(hit_flat))

        def xla(f):
            g = jnp.where(hit_flat.reshape(-1)[:, None],
                          f[jnp.maximum(nmap_flat, 0).reshape(-1)], 0.0)
            return g.reshape(K, Q, C).transpose(0, 2, 1)

        def pallas(f):
            return wg.window_gather_t(f, nmap_flat, hit_flat)

        t_x = scan_time(xla, feats)
        t_p = scan_time(pallas, feats)
        # exactness on-chip + which path ran (ovf=True means the XLA
        # fallback was measured, not the kernel)
        ok = bool(jnp.all(jnp.abs(pallas(feats).astype(jnp.float32)
                                  - xla(feats).astype(jnp.float32))
                          == 0.0))
        pad = (-Q) % (wg.GROUP * wg.TILE)
        nm = jnp.pad(nmap_flat, ((0, 0), (0, pad)))
        ht = jnp.pad(hit_flat, ((0, 0), (0, pad)))
        window = wg._wg_for(C) * (wg.LANES // C)
        rr = Q + (-Q) % (2 * window)
        ovf = bool(wg.window_prep(nm, ht, rr, C)[2])
        print(f'stage{s} C={C:3d} rows={K * Q} hits={hits} '
              f'xla {t_x * 1e3:7.3f} ms  pallas {t_p * 1e3:7.3f} ms  '
              f'({t_x / t_p:4.2f}x)  exact={ok} fallback={ovf}')


if __name__ == '__main__':
    main()
