"""Per-op scan-slope decomposition of the GGA SparseEncoder BACKWARD.

The round-3 step profile (CLAUDE.md) put the encoder bwd at ~230 ms per
batch-8 — 41% of the 557 ms step — but only the forward ever got a
per-op ladder (tools/microbench_encoder.py). This tool measures, at each
stage's BATCH-FLAT shape (B*N rows like the real program), the fwd and
fwd+bwd scan-slope of every encoder primitive and derives the bwd cost
(fwd+bwd minus fwd), plus the two halves of the subm VJP in isolation:

  - dw only:  grad wrt weights  = re-gather(features) + einsum knc,nd
              (the re-gather CSEs with the forward's identical gather)
  - df only:  grad wrt features = gather(dout) + mirrored einsum knd,kdc

so the dominant bwd term (dw einsums vs dout re-gathers vs strided
rulebook bwd) is directly visible. Respects GGA_WINDOW_CONV /
GGA_WINDOW_GATHER env gates — run twice for an A/B.

Reference analog: the spconv backward this engine replaces
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
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from gga_tpu.utils.env import setup_compilation_cache
    setup_compilation_cache()
    from gga_tpu.ops import sparse as sp

    dt = jnp.dtype(args.dtype)
    rng = np.random.RandomState(0)
    B = args.b

    # per-scene (N, C, grid) at each stage (gga kitti config budgets)
    STAGES = [
        (16000, 16, (41, 1600, 1408)),
        (16000, 32, (21, 800, 704)),
        (14000, 64, (11, 400, 352)),
        (12000, 128, (5, 200, 176)),
    ]

    def mk_scene(n, grid):
        nz, ny, nx = grid
        lin = np.sort(rng.choice(min(nz * ny * nx, 2 ** 31 - 1),
                                 n, replace=False).astype(np.int64))
        return np.stack([lin // (ny * nx), (lin % (ny * nx)) // nx,
                         lin % nx], -1).astype(np.int32)

    def timed(name, fn, x0, *consts):
        """scan-slope of fn(x, *consts) -> scalar-ish feedback."""
        times = {}
        for k in (1, args.k):
            @jax.jit
            def run(x, *cs, k=k):
                def body(x, _):
                    return fn(x, *cs), ()
                x, _ = jax.lax.scan(body, x, None, length=k)
                return x
            out = run(x0, *consts)
            jax.block_until_ready(out)
            t0 = time.perf_counter()
            for _ in range(3):
                out = run(x0, *consts)
            jax.block_until_ready(out)
            times[k] = (time.perf_counter() - t0) / 3
        dtv = max((times[args.k] - times[1]) / (args.k - 1), 1e-9)
        print(f'{name:44s} {dtv * 1e3:9.3f} ms')
        return dtv

    tot_f, tot_b = 0.0, 0.0
    for si, (n, c, grid) in enumerate(STAGES):
        # batch of B scenes -> flat maps exactly like models/layers.py
        from gga_tpu.models.layers import flatten_nmap
        coords = jnp.asarray(np.stack(
            [mk_scene(n, grid) for _ in range(B)]))
        valid = jnp.ones((B, n), bool)

        def mk_maps(cs, vs):
            def one(cc, vv):
                st = sp.SparseTensor(
                    jnp.zeros((cc.shape[0], 1), jnp.float32), cc, vv,
                    tuple(grid))
                return sp.build_neighbor_map(st)
            m, h = jax.vmap(one)(cs, vs)
            return flatten_nmap(m, h)
        nmap, hit = jax.jit(mk_maps)(coords, valid)
        jax.block_until_ready(nmap)
        vflat = valid.reshape(-1)
        R = B * n
        feats = jnp.asarray(rng.randn(R, c).astype(np.float32), dt)
        w = jnp.asarray(rng.randn(27, c, c).astype(np.float32) * 0.1, dt)

        def conv(ff, ww):
            from gga_tpu.models import layers as L  # noqa: F401
            if (sp.WINDOW_CONV and sp._wc_ok(c)):
                return sp.subm_conv_window(ff, vflat, nmap, hit, ww)
            return sp.subm_conv_with_map(ff, vflat, nmap, hit, ww)

        def fb(x):
            return (jnp.sum(x) * 1e-12).astype(dt)

        # forward-only
        def f_fwd(ff, ww):
            return ff + fb(conv(ff, ww))
        t_f = timed(f'S{si} subm fwd          R={R} C={c}',
                    f_fwd, feats, w)

        # fwd + full bwd (df + dw)
        def f_fwdbwd(ff, ww):
            def loss(f_, w_):
                o = conv(f_, w_)
                return jnp.sum(o.astype(jnp.float32) ** 2)
            df, dw = jax.grad(loss, argnums=(0, 1))(ff, ww)
            return ff + fb(df) + fb(dw.astype(dt))
        t_fb = timed(f'S{si} subm fwd+bwd', f_fwdbwd, feats, w)

        # dw half alone (grad wrt weights only)
        def f_dw(ff, ww):
            def loss(w_):
                o = conv(ff, w_)
                return jnp.sum(o.astype(jnp.float32) ** 2)
            dw = jax.grad(loss)(ww)
            return ff + fb(dw.astype(dt))
        t_dw = timed(f'S{si} subm fwd+dw-only', f_dw, feats, w)

        # df half alone (grad wrt features only)
        def f_df(ff, ww):
            def loss(f_):
                o = conv(f_, ww)
                return jnp.sum(o.astype(jnp.float32) ** 2)
            df = jax.grad(loss)(ff)
            return ff + fb(df)
        t_df = timed(f'S{si} subm fwd+df-only', f_df, feats, w)

        # basic block fwd+bwd (2 convs + masked-BN-ish norm + residual)
        def block(ff, ww):
            def bn(x):
                xf = x.astype(jnp.float32)
                mu = xf.mean(0)
                var = ((xf - mu) ** 2).mean(0)
                return ((xf - mu) * jax.lax.rsqrt(var + 1e-3)).astype(dt)
            x = jax.nn.relu(bn(conv(ff, ww)))
            x = jax.nn.relu(bn(conv(x, ww)) + ff)
            return x

        def f_blk(ff, ww):
            return ff + fb(block(ff, ww))
        t_blkf = timed(f'S{si} basicblock fwd', f_blk, feats, w)

        def f_blkb(ff, ww):
            def loss(f_, w_):
                return jnp.sum(block(f_, w_).astype(jnp.float32) ** 2)
            df, dw = jax.grad(loss, argnums=(0, 1))(ff, ww)
            return ff + fb(df) + fb(dw.astype(dt))
        t_blkb = timed(f'S{si} basicblock fwd+bwd', f_blkb, feats, w)

        print(f'   -> subm bwd {1e3 * (t_fb - t_f):7.3f} ms '
              f'(dw ~{1e3 * (t_dw - t_f):6.3f}, df ~'
              f'{1e3 * (t_df - t_f):6.3f}) | block bwd '
              f'{1e3 * (t_blkb - t_blkf):7.3f} ms')

        # strided conv (stage -> next) fwd / fwd+bwd, via the EXACT
        # batched path the model uses: vmapped rulebook construction +
        # FLAT gather+GEMM conv (models/layers.py SparseConv3d) — a
        # vmapped conv would overstate the gather cost ~4x.
        if si < 3:
            n2, c2, _ = STAGES[si + 1]

            from gga_tpu.models.layers import flatten_rulebook
            wd = jnp.asarray(
                rng.randn(27, c, c2).astype(np.float32) * 0.1, dt)
            fB = feats.reshape(B, n, c)

            def strided(ffB, ww):
                def one(cc, vv):
                    st = sp.SparseTensor(
                        jnp.zeros((cc.shape[0], 1), jnp.float32), cc, vv,
                        tuple(grid))
                    return sp.downsample_rulebook(
                        st, (3, 3, 3), (2, 2, 2), (1, 1, 1), n2)
                _, ov, _, fm, bm = jax.vmap(
                    one, out_axes=(0, 0, None, 0, 0))(coords, valid)
                fm_flat, bm_flat = flatten_rulebook(fm, bm, n)
                of = sp.rulebook_conv(ffB.reshape(B * n, c), ww,
                                      fm_flat, bm_flat,
                                      ov.reshape(B * n2))
                return of.reshape(B, n2, c2)

            def rb_only(ffB):
                def one(cc, vv):
                    st = sp.SparseTensor(
                        jnp.zeros((cc.shape[0], 1), jnp.float32), cc, vv,
                        tuple(grid))
                    return sp.downsample_rulebook(
                        st, (3, 3, 3), (2, 2, 2), (1, 1, 1), n2)
                _, ov, _, fm, bm = jax.vmap(
                    one, out_axes=(0, 0, None, 0, 0))(coords, valid)
                return (ffB + (jnp.sum(fm) + jnp.sum(bm)
                               + jnp.sum(ov)).astype(dt) * 1e-12)
            timed(f'S{si} strided rulebook-only', rb_only, fB)

            def f_sf(ffB, ww):
                return ffB + fb(strided(ffB, ww))
            t_sf = timed(f'S{si} strided fwd      {c}->{c2}',
                         f_sf, fB, wd)

            def f_sb(ffB, ww):
                def loss(f_, w_):
                    return jnp.sum(
                        strided(f_, w_).astype(jnp.float32) ** 2)
                df, dw = jax.grad(loss, argnums=(0, 1))(ffB, ww)
                return ffB + fb(df) + fb(dw.astype(dt))
            t_sb = timed(f'S{si} strided fwd+bwd', f_sb, fB, wd)
            print(f'   -> strided bwd {1e3 * (t_sb - t_sf):7.3f} ms')
            tot_f += t_sf
            tot_b += t_sb - t_sf

        nblk = 2
        tot_f += nblk * t_blkf + (t_f if si == 0 else 0.0)
        tot_b += nblk * (t_blkb - t_blkf) + ((t_fb - t_f) if si == 0
                                             else 0.0)

    print(f'--- reconstructed encoder (batch {B}): '
          f'fwd ~{tot_f * 1e3:.1f} ms, bwd ~{tot_b * 1e3:.1f} ms '
          f'(step profile said fwd 245 / bwd ~230)')


if __name__ == '__main__':
    main()
