"""A/B scan-slope microbench: sort-based vs bucket-table neighbor maps.

The SparseEncoder builds one submanifold neighbor map per stage
(build_neighbor_map); at the GGA KITTI shapes this costs ~10 ms/scene of
the ~30 ms/scene encoder forward (CLAUDE.md round-2 profile) — all
integer sort work with no backward. The bucket-table path
(ops/sparse.py _ranks_via_buckets, GGA_NMAP_HASH) replaces the
[K/2, 2N]-key merge sorts with two N-row scatters plus one 4-byte
gather per (offset, row) query.

Usage: python tools/microbench_nmap.py [--k 8]
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
    p.add_argument('--batch', type=int, default=1)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from gga_tpu.utils.env import setup_compilation_cache
    setup_compilation_cache()
    from gga_tpu.ops import sparse as sp

    rng = np.random.RandomState(0)
    # (N, grid) per encoder stage (see tools/microbench_encoder.py)
    STAGES = [
        (16000, (41, 1600, 1408)),
        (16000, (21, 800, 704)),
        (14000, (11, 400, 352)),
        (12000, (5, 200, 176)),
    ]

    def mk_st(n, grid, b):
        nz, ny, nx = grid
        cc, vv = [], []
        for _ in range(b):
            lin = np.sort(rng.choice(nz * ny * nx, n, replace=False)
                          .astype(np.int64))
            cc.append(np.stack([lin // (ny * nx), (lin % (ny * nx)) // nx,
                                lin % nx], -1).astype(np.int32))
            vv.append(np.ones((n,), bool))
        return (jnp.asarray(np.stack(cc)), jnp.asarray(np.stack(vv)))

    def timed(name, fn, c0):
        times = {}
        for k in (1, args.k):
            @jax.jit
            def run(c, k=k):
                def body(c, _):
                    return fn(c), ()
                c, _ = jax.lax.scan(body, c, None, length=k)
                return c
            out = run(c0)
            jax.block_until_ready(out)
            t0 = time.perf_counter()
            for _ in range(5):
                out = run(c0)
            jax.block_until_ready(out)
            times[k] = (time.perf_counter() - t0) / 5
        dtv = (times[args.k] - times[1]) / (args.k - 1)
        print(f'{name:44s} {dtv * 1e3:9.3f} ms')
        return dtv

    f0 = jnp.zeros((), jnp.float32)
    totals = {}
    for mode in (False, True):
        sp.NMAP_HASH = mode
        label = 'hash' if mode else 'sort'
        tot = 0.0
        for si, (n, grid) in enumerate(STAGES):
            coords, valid = mk_st(n, grid, args.batch)

            def f_nmap(cc, coords=coords, valid=valid, grid=grid):
                def one(c, v):
                    st = sp.SparseTensor(
                        jnp.zeros((c.shape[0], 1), jnp.bfloat16),
                        c + jnp.minimum(cc.astype(jnp.int32), 0), v, grid)
                    m, h = sp.build_neighbor_map(st)
                    return (m[0, 0] & 0).astype(jnp.float32) \
                        + h.sum().astype(jnp.float32) * 0
                return jax.vmap(one)(coords, valid).sum()
            tot += timed(f'[{label}] S{si} nmap N={n} B={args.batch} '
                         f'g={grid}', f_nmap, f0)
        totals[label] = tot
        print(f'[{label}] total {tot * 1e3:9.3f} ms')
    print(f'speedup: {totals["sort"] / max(totals["hash"], 1e-9):.2f}x')


if __name__ == '__main__':
    main()
