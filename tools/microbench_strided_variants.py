"""A/B the strided-conv engine variants at the GGA stage shapes.

Round-4 proved the fewer-gather-rows pattern on the strided BACKWARD
(compact bwd_d map: 13.98 -> 14.45 scenes/s). The remaining strided
costs are (a) the [K, B*M] fwd-map scatter + merge-ranks in the build
and (b) the K*B*M-row forward gather (27M rows vs only D*N ~ 8N real
links at k3s2 with saturated budgets). This tool measures, per GGA
strided stage with DISTINCT coords threaded through the scan (the
round-3/4 hoisting trap):

  build   merge | scatter | pairmajor   (rulebook construction only)
  conv    compact | pairmajor           (fwd and fwd+bwd, maps prebuilt)
  full    compact(merge|scatter) | pairmajor  (build + conv, fwd+bwd)

plus a raw TPU scatter-add ROW-rate probe (--probe): the pair-major
forward replaces a 27M-row gather with a D*B*N-row scatter-add, and no
prior measurement establishes the row rate of `.at[idx].add(rows)` on
this hardware (the rulebook scatters measured ~320M SCALAR updates/s).

Reference being beaten: spconv's GEMM-per-offset strided conv
(/root/reference/mmdet3d/models/middle_encoders/sparse_encoder.py:108).
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--b', type=int, default=8)
    p.add_argument('--k', type=int, default=6)
    p.add_argument('--dtype', default='bfloat16')
    p.add_argument('--probe', action='store_true',
                   help='only run the scatter-add row-rate probe')
    p.add_argument('--nmap', action='store_true',
                   help='only run the neighbor-map build A/B '
                        '(batched vs merged single-sort ranks)')
    p.add_argument('--cpu', action='store_true')
    args = p.parse_args()

    import jax
    if args.cpu:
        jax.config.update('jax_platforms', 'cpu')
    import jax.numpy as jnp
    import numpy as np

    from gga_tpu.utils.env import setup_compilation_cache
    setup_compilation_cache()
    from gga_tpu.ops import sparse as S

    dt = jnp.dtype(args.dtype)
    rng = np.random.RandomState(0)
    B = args.b

    def scan_time(fn, xs_all, carry0):
        """Slope between 1 and --k scan steps over DISTINCT xs. Each
        timed rep fetches a host scalar — block_until_ready alone can
        return early for pure-dataflow programs on this relay
        (CLAUDE.md round-5 timing trap)."""
        import numpy as _np
        times = {}
        for k in (1, args.k):
            @jax.jit
            def run(xs, c0):
                def body(c, x):
                    out = fn(c, x)
                    leaves = jax.tree_util.tree_leaves(out)
                    fb = sum(l.astype(jnp.float32).sum() for l in leaves)
                    return c + (fb * 1e-12).astype(c.dtype), 0
                c, _ = jax.lax.scan(body, c0, xs)
                return jnp.sum(c).astype(jnp.float32)
            xs = jax.tree_util.tree_map(lambda a: a[:k], xs_all)
            _np.asarray(run(xs, carry0))
            t0 = time.perf_counter()
            for _ in range(3):
                _np.asarray(run(xs, carry0))
            times[k] = (time.perf_counter() - t0) / 3
        return max((times[args.k] - times[1]) / (args.k - 1), 1e-9)

    if args.probe:
        # scatter-add row rate: rows [R, C] dt added at random idx into
        # [M, C]; vs the row-gather rate at the same shape.
        for R, M, C in [(1024 * 1024, 128 * 1024, 32),
                        (896 * 1024, 112 * 1024, 64),
                        (768 * 1024, 96 * 1024, 128)]:
            rows = jnp.asarray(
                rng.randn(args.k, R, C).astype(np.float32), dt)
            idx = jnp.asarray(rng.randint(0, M, size=(args.k, R)),
                              jnp.int32)
            base = jnp.zeros((M, C), jnp.float32)

            def scat(c, x):
                r, ix = x
                return base.at[ix].add(r.astype(jnp.float32)) + c * 0

            t = scan_time(scat, (rows, idx), jnp.zeros((), jnp.float32))
            print(f'scatter-add [R={R} C={C} dt={args.dtype}] '
                  f'{t * 1e3:8.3f} ms  {R / t / 1e6:7.1f} M rows/s')

            src = jnp.asarray(rng.randn(M, C).astype(np.float32), dt)

            def gath(c, x):
                _, ix = x
                return src[ix % M] + c * 0

            t = scan_time(gath, (rows, idx),
                          jnp.zeros((R, C), dt))
            print(f'row-gather  [R={R} C={C} dt={args.dtype}] '
                  f'{t * 1e3:8.3f} ms  {R / t / 1e6:7.1f} M rows/s')
        return

    if args.nmap:
        # 13-offset neighbor-map build: batched [13, 2N] merge sorts vs
        # the single [14N] stream sort (GGA_NMAP_MERGED)
        for n, grid in [(16000, (41, 1600, 1408)), (16000, (21, 800, 704)),
                        (14000, (11, 400, 352)), (12000, (5, 200, 176))]:
            coords = np.full((args.k, B, n, 3), -1, np.int32)
            for k in range(args.k):
                for b in range(B):
                    lin = np.sort(rng.choice(
                        min(np.int64(grid[0]) * grid[1] * grid[2],
                            2 ** 31 - 2), n,
                        replace=False).astype(np.int64))
                    coords[k, b] = np.stack(
                        [lin // (grid[1] * grid[2]),
                         (lin % (grid[1] * grid[2])) // grid[2],
                         lin % grid[2]], -1)
            coords = jnp.asarray(coords)
            validj = jnp.ones((B, n), bool)

            def nmap_build(c, merged, full):
                old = (S.NMAP_MERGED, S.NMAP_FULL)
                S.NMAP_MERGED, S.NMAP_FULL = merged, full
                try:
                    def one(cc, vv):
                        st = S.SparseTensor(
                            jnp.zeros((cc.shape[0], 1), jnp.float32),
                            cc, vv, grid)
                        return S.build_neighbor_map(st)
                    return jax.vmap(one)(c, validj)
                finally:
                    S.NMAP_MERGED, S.NMAP_FULL = old

            t_b = scan_time(lambda _, c: nmap_build(c, False, False),
                            coords, jnp.zeros(()))
            t_m = scan_time(lambda _, c: nmap_build(c, True, False),
                            coords, jnp.zeros(()))
            t_f = scan_time(lambda _, c: nmap_build(c, True, True),
                            coords, jnp.zeros(()))
            print(f'nmap N={n} grid={grid}: batched {t_b * 1e3:7.3f} | '
                  f'merged {t_m * 1e3:7.3f} | merged-full '
                  f'{t_f * 1e3:7.3f} ms')
        return

    STAGES = [  # (N_in, out_budget, in_grid, Cin, Cout)
        (16000, 16000, (41, 1600, 1408), 16, 32),
        (16000, 14000, (21, 800, 704), 32, 64),
        (14000, 12000, (11, 400, 352), 64, 128),
    ]
    ks, stv, pad = (3, 3, 3), (2, 2, 2), (1, 1, 1)

    for si, (n, bud, grid, cin, cout) in enumerate(STAGES):
        coords = np.full((args.k, B, n, 3), -1, np.int32)
        for k in range(args.k):
            for b in range(B):
                lin = np.sort(rng.choice(
                    min(np.int64(grid[0]) * grid[1] * grid[2],
                        2 ** 31 - 2), n, replace=False).astype(np.int64))
                coords[k, b] = np.stack(
                    [lin // (grid[1] * grid[2]),
                     (lin % (grid[1] * grid[2])) // grid[2],
                     lin % grid[2]], -1)
        coords = jnp.asarray(coords)
        validj = jnp.ones((B, n), bool)
        feats = jnp.asarray(rng.randn(B * n, cin).astype(np.float32), dt)
        w = jnp.asarray(
            rng.randn(27, cin, cout).astype(np.float32) * 0.1, dt)

        def build_compact(c, mode):
            old = S.RB_RANKS
            S.RB_RANKS = mode
            try:
                out = S.downsample_rulebook_compact(
                    c, validj, grid, ks, stv, pad, bud)
            finally:
                S.RB_RANKS = old
            return out

        def build_pm(c):
            return S.downsample_rulebook_pairmajor(
                c, validj, grid, ks, stv, pad, bud)

        t_bm = scan_time(lambda _, c: build_compact(c, 'merge')[3:],
                         coords, jnp.zeros(()))
        t_bs = scan_time(lambda _, c: build_compact(c, 'scatter')[3:],
                         coords, jnp.zeros(()))
        t_bp = scan_time(lambda _, c: build_pm(c)[3:],
                         coords, jnp.zeros(()))
        print(f'S{si} build   merge {t_bm * 1e3:7.3f} | scatter '
              f'{t_bs * 1e3:7.3f} | pairmajor {t_bp * 1e3:7.3f} ms')

        # prebuild maps for each scan step (conv-only timing)
        @jax.jit
        def mk_maps(c):
            _, ov, _, fm, bd, par = S.downsample_rulebook_compact(
                c, validj, grid, ks, stv, pad, bud)
            return fm, bd, par, ov.reshape(-1)
        maps = jax.vmap(mk_maps)(coords)
        jax.block_until_ready(maps)

        def conv_compact(f, x):
            fm, bd, par, ovf = x
            return S.rulebook_conv_compact(f, w, fm, bd, par, ovf,
                                           ks, stv)

        def conv_pm(f, x):
            _, bd, par, ovf = x
            return S.rulebook_conv_pairmajor(f, w, bd, par, ovf,
                                             ks, stv)

        def grad_of(conv):
            def g(f, x):
                def loss(f_, w_):
                    # w_ captured via closure won't differentiate;
                    # rebind through the conv call
                    return jnp.sum(conv(f_, x).astype(jnp.float32) ** 2)
                df = jax.grad(loss)(f, w)
                return df
            return g

        t_cf = scan_time(conv_compact, maps, feats)
        t_pf = scan_time(conv_pm, maps, feats)
        t_cb = scan_time(grad_of(conv_compact), maps, feats)
        t_pb = scan_time(grad_of(conv_pm), maps, feats)
        print(f'S{si} conv    compact fwd {t_cf * 1e3:7.3f} '
              f'fwd+df {t_cb * 1e3:7.3f} | pairmajor fwd '
              f'{t_pf * 1e3:7.3f} fwd+df {t_pb * 1e3:7.3f} ms')

        # full path: build + conv, fwd+bwd wrt (features, weights)
        def full(mode):
            def g(f, c):
                def loss(f_, w_):
                    if mode == 'pm':
                        _, ov, _, bd, par = build_pm(c)
                        o = S.rulebook_conv_pairmajor(
                            f_, w_, bd, par, ov.reshape(-1), ks, stv)
                    else:
                        _, ov, _, fm, bd, par = build_compact(c, mode)
                        o = S.rulebook_conv_compact(
                            f_, w_, fm, bd, par, ov.reshape(-1),
                            ks, stv)
                    return jnp.sum(o.astype(jnp.float32) ** 2)
                df, dw = jax.grad(loss, argnums=(0, 1))(f, w)
                return df, dw
            return g

        t_fm = scan_time(full('merge'), coords, feats)
        t_fs = scan_time(full('scatter'), coords, feats)
        t_fp = scan_time(full('pm'), coords, feats)
        print(f'S{si} full    merge {t_fm * 1e3:7.3f} | scatter '
              f'{t_fs * 1e3:7.3f} | pairmajor {t_fp * 1e3:7.3f} ms')


if __name__ == '__main__':
    main()
