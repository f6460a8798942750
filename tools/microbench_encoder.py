"""Per-stage scan-slope decomposition of the GGA SparseEncoder forward.

The full encoder fwd measures ~75 ms/scene on TPU while stage-0-shape
per-op numbers (tools/microbench_sparse.py) only explain ~1/3 of it.
This bench times the encoder's primitive ops at EACH stage's real
(N, C, grid) in bf16 and reconstructs the predicted total, so the gap
localizes to a stage or an op family.

Encoder structure (models/middle_encoders.py SparseEncoder, GGA kitti
config): conv_input SubM(4->16); per stage i: 2 SparseBasicBlocks
(2 SubM each) then a k3 s2 strided conv (last stage: none); conv_out
k(3,1,1) s(2,1,1); densify scatter.
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

    # (N, C_stage, grid, budget_of_next_downsample, C_next)
    STAGES = [
        (16000, 16, (41, 1600, 1408), 16000, 32),
        (16000, 32, (21, 800, 704), 14000, 64),
        (14000, 64, (11, 400, 352), 12000, 128),
        (12000, 128, (5, 200, 176), None, None),
    ]

    def mk_st(n, c, grid):
        nz, ny, nx = grid
        lin = np.sort(rng.choice(min(nz * ny * nx, 2 ** 31 - 1),
                                 n, replace=False).astype(np.int64))
        coords = np.stack([lin // (ny * nx), (lin % (ny * nx)) // nx,
                           lin % nx], -1).astype(np.int32)
        f = rng.randn(n, c).astype(np.float32)
        return sp.SparseTensor(jnp.asarray(f, dt), jnp.asarray(coords),
                               jnp.ones((n,), bool), grid)

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
        print(f'{name:40s} {dtv * 1e3:9.3f} ms')
        return dtv

    f0 = jnp.zeros((), dt)
    total = 0.0
    for si, (n, c, grid, bud, c2) in enumerate(STAGES):
        st = mk_st(n, c, grid)
        nmap, hit = jax.jit(lambda st=st: sp.build_neighbor_map(st))()
        jax.block_until_ready(nmap)
        w = jnp.asarray(rng.randn(27, c, c).astype(np.float32) * 0.1, dt)

        def f_nmap(cc, st=st):
            s2 = st.replace(coords=st.coords
                            + jnp.minimum(cc.astype(jnp.int32), 0))
            m, h = sp.build_neighbor_map(s2)
            return (m[0, 0] & 0).astype(dt) + h.sum().astype(dt) * 0
        t_n = timed(f'S{si} nmap        N={n} g={grid}', f_nmap, f0)

        def f_subm(cc, st=st, nmap=nmap, hit=hit, w=w):
            ff = st.features + jnp.minimum(cc, 0).astype(dt)
            o = sp.subm_conv_with_map(ff, st.valid, nmap, hit, w)
            return jnp.minimum(o.sum(), 0).astype(dt)
        t_s = timed(f'S{si} subm fwd    N={n} C={c}', f_subm, f0)

        # basic block: subm+bn+relu, subm+bn+relu(+id) — bn as raw math
        def f_block(cc, st=st, nmap=nmap, hit=hit, w=w):
            ff = st.features + jnp.minimum(cc, 0).astype(dt)

            def bn(x):
                xf = x.astype(jnp.float32)
                mu = xf.mean(0)
                var = ((xf - mu) ** 2).mean(0)
                return ((xf - mu) * jax.lax.rsqrt(var + 1e-3)).astype(dt)

            x = sp.subm_conv_with_map(ff, st.valid, nmap, hit, w)
            x = jax.nn.relu(bn(x))
            x = sp.subm_conv_with_map(x, st.valid, nmap, hit, w)
            x = jax.nn.relu(bn(x) + ff)
            return jnp.minimum(x.sum(), 0).astype(dt)
        t_b = timed(f'S{si} basicblock  N={n} C={c}', f_block, f0)

        if bud is not None:
            wd = jnp.asarray(
                rng.randn(27, c, c2).astype(np.float32) * 0.1, dt)

            def f_str(cc, st=st, wd=wd, bud=bud):
                ff = st.features + jnp.minimum(cc, 0).astype(dt)
                s2 = st.replace(features=ff)
                o = sp.sparse_conv_fast(s2, wd, (3, 3, 3), (2, 2, 2),
                                        (1, 1, 1), bud)
                return jnp.minimum(o.features.sum(), 0).astype(dt)
            t_d = timed(f'S{si} strided     {c}->{c2} bud={bud}',
                        f_str, f0)
        else:
            # conv_out k(3,1,1) s(2,1,1) + densify
            wo = jnp.asarray(
                rng.randn(3, c, 128).astype(np.float32) * 0.1, dt)

            def f_out(cc, st=st, wo=wo, n=n):
                ff = st.features + jnp.minimum(cc, 0).astype(dt)
                s2 = st.replace(features=ff)
                o = sp.sparse_conv_fast(s2, wo, (3, 1, 1), (2, 1, 1),
                                        (0, 0, 0), n)
                nz, ny, nx = o.grid
                z = jnp.where(o.valid, o.coords[:, 0], nz)
                y = jnp.where(o.valid, o.coords[:, 1], 0)
                xx = jnp.where(o.valid, o.coords[:, 2], 0)
                dense = jnp.zeros((nz + 1, ny, nx, 128), dt)
                dense = dense.at[z, y, xx].set(
                    jnp.where(o.valid[:, None], o.features, 0))
                return jnp.minimum(dense.sum(), 0).astype(dt)
            t_d = timed(f'S{si} conv_out+densify', f_out, f0)

        nblk = 2
        total += t_n + nblk * t_b + t_d + (t_s if si == 0 else 0.0)

    print(f'--- reconstructed encoder fwd ~ {total * 1e3:.1f} ms '
          f'(measured whole-encoder: ~75 ms/scene)')


if __name__ == '__main__':
    main()
