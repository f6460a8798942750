"""Scan-slope decomposition of the model's STRIDED conv layer (compact
backward path — models/layers.py SparseConv3d) at batch-flat GGA shapes.

The round-4 bwd decomposition (tools/microbench_encoder_bwd.py) showed
the s2 convs dominate the encoder (~105 ms fwd + ~99 ms bwd of the
batch-8 step), but measured them through the OLD dense-bwd
rulebook_conv and never split build / gather / GEMM. This tool times,
per stage, on the exact compact path the model runs:

  1. rulebook build only        (downsample_rulebook_compact)
  2. conv fwd, rb precomputed   (rulebook_conv_compact fwd)
  3.   gather only              (_rb_gather of the [K, B*M] fwd map)
  4.   einsum only              (knc,kcd->nd on a pregathered g)
  5. conv fwd+bwd, rb precomputed (+ dw-only / df-only splits)
  6. full layer fwd / fwd+bwd   (build + conv, what the model pays)

Every stage consumes a DISTINCT coords batch (or feature scale) per scan
step so nothing is loop-invariant; big arrays are jit ARGUMENTS (relay
413 guard). Reference analog: the spconv strided path this replaces
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
    p.add_argument('--k', type=int, default=8)
    p.add_argument('--b', type=int, default=8)
    p.add_argument('--dtype', default='bfloat16')
    p.add_argument('--stages', default='0,1,2')
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from gga_tpu.utils.env import setup_compilation_cache
    setup_compilation_cache()
    from gga_tpu.ops import sparse as S

    dt = jnp.dtype(args.dtype)
    B, K = args.b, args.k
    rng = np.random.RandomState(0)
    STAGES = [  # (N_in, C_in, C_out, out_budget, in_grid)
        (16000, 16, 32, 14000, (41, 1600, 1408)),
        (14000, 32, 64, 12000, (21, 800, 704)),
        (12000, 64, 128, 12000, (11, 400, 352)),
    ]

    def scan_time(fn, *fixed_args, xs=None):
        """Slope between 1 and K scan steps over DISTINCT xs."""
        times = {}
        for k in (1, K):
            @jax.jit
            def run(xs_, *fa):
                def body(carry, x):
                    out = jax.tree_util.tree_leaves(fn(x, *fa))
                    fold = sum(o.astype(jnp.float32).sum() for o in out)
                    return carry + fold * 1e-12, 0
                s, _ = jax.lax.scan(body, jnp.zeros(()), xs_)
                return s
            xs_k = jax.tree_util.tree_map(lambda a: a[:k], xs)
            jax.block_until_ready(run(xs_k, *fixed_args))
            t0 = time.perf_counter()
            for _ in range(3):
                out = run(xs_k, *fixed_args)
            jax.block_until_ready(out)
            times[k] = (time.perf_counter() - t0) / 3
        return max((times[K] - times[1]) / (K - 1), 1e-9)

    for si, (n, c, c2, bud, grid) in enumerate(STAGES):
        if str(si) not in args.stages.split(','):
            continue
        coords = np.full((K, B, n, 3), -1, np.int32)
        for k in range(K):
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
        feats = jnp.asarray(rng.randn(B * n, c).astype(np.float32), dt)
        w = jnp.asarray(rng.randn(27, c, c2).astype(np.float32) * 0.1, dt)
        eps = jnp.arange(K, dtype=jnp.float32) * 1e-4

        # 1. rulebook build only
        def build(cb):
            oc, ov, og, fm, bwd_d, par = S.downsample_rulebook_compact(
                cb, validj, grid, (3, 3, 3), (2, 2, 2), (1, 1, 1), bud)
            return fm[:1] + bwd_d[:1] + par[:1]
        t_build = scan_time(build, xs=coords)

        # precompute one rulebook on device for the conv-only stages
        rb = jax.jit(lambda cb: S.downsample_rulebook_compact(
            cb, validj, grid, (3, 3, 3), (2, 2, 2), (1, 1, 1),
            bud))(coords[0])
        oc, ov, og, fm, bwd_d, par = jax.block_until_ready(rb)
        ovf = ov.reshape(-1)

        # 2. conv fwd (rb fixed, features scaled per step)
        def conv_fwd(e, f_, ww, fm_, bd_, pr_, ov_):
            return S.rulebook_conv_compact(
                f_ * (1 + e).astype(dt), ww, fm_, bd_, pr_, ov_,
                (3, 3, 3), (2, 2, 2))
        t_cf = scan_time(conv_fwd, feats, w, fm, bwd_d, par, ovf, xs=eps)

        # 3. gather only
        def gath(e, f_, fm_):
            return S._rb_gather(f_ * (1 + e).astype(dt), fm_)[:1]
        t_g = scan_time(gath, feats, fm, xs=eps)

        # 4. einsum only, on a pregathered g
        g0 = jax.jit(lambda f_, fm_: S._rb_gather(f_, fm_))(feats, fm)
        jax.block_until_ready(g0)

        def ein(e, g_, ww):
            out = jnp.einsum('knc,kcd->nd', g_ * (1 + e).astype(dt),
                             ww.astype(dt),
                             preferred_element_type=jnp.float32)
            return out[:1]
        t_e = scan_time(ein, g0, w, xs=eps)

        # 5. conv fwd+bwd (+ split halves)
        def conv_fb(e, f_, ww, fm_, bd_, pr_, ov_):
            def loss(ff, www):
                o = conv_fwd(e, ff, www, fm_, bd_, pr_, ov_)
                return jnp.sum(o.astype(jnp.float32) ** 2)
            df, dw = jax.grad(loss, argnums=(0, 1))(f_, ww)
            return df[:1] + 0 * dw[:1, :1, :1].sum()
        t_cb = scan_time(conv_fb, feats, w, fm, bwd_d, par, ovf, xs=eps)

        def conv_df(e, f_, ww, fm_, bd_, pr_, ov_):
            def loss(ff):
                o = conv_fwd(e, ff, ww, fm_, bd_, pr_, ov_)
                return jnp.sum(o.astype(jnp.float32) ** 2)
            return jax.grad(loss)(f_)[:1]
        t_df = scan_time(conv_df, feats, w, fm, bwd_d, par, ovf, xs=eps)

        def conv_dw(e, f_, ww, fm_, bd_, pr_, ov_):
            def loss(www):
                o = conv_fwd(e, f_, www, fm_, bd_, pr_, ov_)
                return jnp.sum(o.astype(jnp.float32) ** 2)
            return jax.grad(loss)(ww)[:1, :1, :1]
        t_dw = scan_time(conv_dw, feats, w, fm, bwd_d, par, ovf, xs=eps)

        # 6. full layer = build + conv (the model's real cost)
        def layer_fwd(x, f_, ww):
            cb, e = x
            oc_, ov_, og_, fm_, bd_, pr_ = S.downsample_rulebook_compact(
                cb, validj, grid, (3, 3, 3), (2, 2, 2), (1, 1, 1), bud)
            return S.rulebook_conv_compact(
                f_ * (1 + e).astype(dt), ww, fm_, bd_, pr_,
                ov_.reshape(-1), (3, 3, 3), (2, 2, 2))
        t_lf = scan_time(layer_fwd, feats, w, xs=(coords, eps))

        def layer_fb(x, f_, ww):
            def loss(ff, www):
                o = layer_fwd(x, ff, www)
                return jnp.sum(o.astype(jnp.float32) ** 2)
            df, dw = jax.grad(loss, argnums=(0, 1))(f_, ww)
            return df[:1] + 0 * dw[:1, :1, :1].sum()
        t_lb = scan_time(layer_fb, feats, w, xs=(coords, eps))

        print(f'S{si} B={B} N={n} C={c}->{c2} bud={bud}')
        print(f'  build only          {t_build * 1e3:8.3f} ms')
        print(f'  conv fwd (rb fixed) {t_cf * 1e3:8.3f} ms'
              f'   [gather {t_g * 1e3:.3f} + einsum {t_e * 1e3:.3f}]')
        print(f'  conv fwd+bwd        {t_cb * 1e3:8.3f} ms'
              f'   [fwd+df {t_df * 1e3:.3f}, fwd+dw {t_dw * 1e3:.3f}]')
        print(f'  layer fwd           {t_lf * 1e3:8.3f} ms'
              f'   (build+conv = {(t_build + t_cf) * 1e3:.3f})')
        print(f'  layer fwd+bwd       {t_lb * 1e3:8.3f} ms')
    print('EXIT=0')


if __name__ == '__main__':
    main()
