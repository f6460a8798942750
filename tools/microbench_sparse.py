"""Per-op scan-slope microbenchmark of the sparse-conv engine on TPU.

Per CLAUDE.md, per-launch timing is unreliable on this machine's relay;
the only trustworthy measurement is the marginal time of K steps chained
inside one program via lax.scan (slope between K=1 and K=k).

Each op is chained by threading an opaque carry into its inputs
(``jnp.minimum(carry, 0)`` added to int inputs / ``carry * 0 + x`` style
would fold; a runtime-only-nonnegative scalar defeats CSE without
changing values).

Usage:
    python tools/microbench_sparse.py [--n 16000] [--c 16] [--ops a,b,...]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--n', type=int, default=16000)
    p.add_argument('--c', type=int, default=16)
    p.add_argument('--grid', default='41,1600,1408')
    p.add_argument('--k', type=int, default=8, help='scan length')
    p.add_argument('--ops', default='all')
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from gga_tpu.utils.env import setup_compilation_cache
    setup_compilation_cache()

    from gga_tpu.ops import sparse as sp

    N, C = args.n, args.c
    grid = tuple(int(v) for v in args.grid.split(','))

    # synthetic active set: uniform cells, sorted by linear id
    rng = np.random.RandomState(0)
    nz, ny, nx = grid
    lin = np.sort(rng.choice(nz * ny * nx, N, replace=False).astype(
        np.int64))
    coords = np.stack([lin // (ny * nx), (lin % (ny * nx)) // nx,
                       lin % nx], -1).astype(np.int32)
    feats = rng.randn(N, C).astype(np.float32)
    valid = np.ones((N,), bool)

    st = sp.SparseTensor(jnp.asarray(feats), jnp.asarray(coords),
                         jnp.asarray(valid), grid)
    w27 = jnp.asarray(rng.randn(27, C, C).astype(np.float32) * 0.1)
    w27d = jnp.asarray(rng.randn(27, C, 2 * C).astype(np.float32) * 0.1)

    nmap, hit = jax.jit(
        lambda s: sp.build_neighbor_map(s))(st)
    jax.block_until_ready(nmap)

    def timed(name, fn, carry0):
        """fn(carry) -> new_carry (scalar f32/int32)."""
        ks = (1, args.k)
        times = {}
        for k in ks:
            @jax.jit
            def run(c0, k=k):
                def body(c, _):
                    return fn(c), ()
                c, _ = jax.lax.scan(body, c0, None, length=k)
                return c
            out = run(carry0)
            jax.block_until_ready(out)   # compile+warm
            t0 = time.perf_counter()
            reps = 5
            for _ in range(reps):
                out = run(carry0)
            jax.block_until_ready(out)
            times[k] = (time.perf_counter() - t0) / reps
        dt = (times[args.k] - times[1]) / (args.k - 1)
        print(f'{name:34s} {dt * 1e3:9.3f} ms'
              f'   (k1 {times[1] * 1e3:.1f} ms, k{args.k} '
              f'{times[args.k] * 1e3:.1f} ms)')
        return dt

    sel = args.ops.split(',') if args.ops != 'all' else [
        'nmap', 'subm_gather', 'subm_einsum', 'subm_fwd', 'subm_fwdbwd',
        'down', 'gather_strided', 'strided_fwd', 'strided_fwdbwd']

    zero = jnp.zeros((), jnp.int32)

    def dep_coords(c):
        # runtime-zero perturbation: carry is provably-nonneg only at
        # runtime, so XLA cannot fold the min away
        return st.coords + jnp.minimum(c, 0)

    if 'nmap' in sel:
        def f(c):
            s2 = st.replace(coords=dep_coords(c))
            m, h = sp.build_neighbor_map(s2)
            return (m[0, 0] & 0) + h.sum().astype(jnp.int32)
        timed('build_neighbor_map', f, zero)

    if 'subm_gather' in sel:
        def f(c):
            ff = st.features + jnp.minimum(c, 0.0)
            g = jnp.where(hit[..., None], ff[nmap], 0.0)
            return jnp.minimum(g.sum(), 0.0)
        timed('subm gather27 only', f, jnp.zeros((), jnp.float32))

    if 'subm_einsum' in sel:
        g0 = jax.jit(lambda: jnp.where(
            hit[..., None], st.features[nmap], 0.0))()
        jax.block_until_ready(g0)

        def f(c):
            g = g0 + jnp.minimum(c, 0.0)
            o = jnp.einsum('knc,kcd->nd', g, w27,
                           preferred_element_type=jnp.float32)
            return jnp.minimum(o.sum(), 0.0)
        timed('subm einsum only', f, jnp.zeros((), jnp.float32))

    if 'subm_fwd' in sel:
        def f(c):
            ff = st.features + jnp.minimum(c, 0.0)
            o = sp.subm_conv_with_map(ff, st.valid, nmap, hit, w27)
            return jnp.minimum(o.sum(), 0.0)
        timed('subm_conv_with_map fwd', f, jnp.zeros((), jnp.float32))

    if 'subm_fwdbwd' in sel:
        def loss(ff):
            return sp.subm_conv_with_map(ff, st.valid, nmap, hit,
                                         w27).sum()

        def f(c):
            ff = st.features + jnp.minimum(c, 0.0)
            g = jax.grad(loss)(ff)
            return jnp.minimum(g.sum(), 0.0)
        timed('subm_conv fwd+bwd', f, jnp.zeros((), jnp.float32))

    if 'down' in sel:
        def f(c):
            s2 = st.replace(coords=dep_coords(c))
            oc, ov, og = sp.downsample_coords(s2, (3, 3, 3), (2, 2, 2),
                                              (1, 1, 1), N)
            return oc.sum() + ov.sum().astype(jnp.int32)
        timed('downsample_coords', f, zero)

    oc, ov, og = jax.jit(lambda: sp.downsample_coords(
        st, (3, 3, 3), (2, 2, 2), (1, 1, 1), N))()
    jax.block_until_ready(oc)

    if 'gather_strided' in sel:
        def f(c):
            ff = st.features + jnp.minimum(c, 0.0)
            s2 = st.replace(features=ff)
            g = sp.gather_neighbors(s2, oc, ov, (3, 3, 3), (2, 2, 2),
                                    (1, 1, 1))
            return jnp.minimum(g.sum(), 0.0)
        timed('gather_neighbors strided', f, jnp.zeros((), jnp.float32))

    if 'strided_fwd' in sel:
        def f(c):
            ff = st.features + jnp.minimum(c, 0.0)
            s2 = st.replace(features=ff)
            o = sp.sparse_conv_fast(s2, w27d, (3, 3, 3), (2, 2, 2),
                                    (1, 1, 1), N)
            return jnp.minimum(o.features.sum(), 0.0)
        timed('sparse_conv_fast fwd', f, jnp.zeros((), jnp.float32))

    if 'strided_fwdbwd' in sel:
        def loss(ff):
            s2 = st.replace(features=ff)
            o = sp.sparse_conv_fast(s2, w27d, (3, 3, 3), (2, 2, 2),
                                    (1, 1, 1), N)
            return o.features.sum()

        def f(c):
            ff = st.features + jnp.minimum(c, 0.0)
            g = jax.grad(loss)(ff)
            return jnp.minimum(g.sum(), 0.0)
        timed('sparse_conv_fast fwd+bwd', f, jnp.zeros((), jnp.float32))


if __name__ == '__main__':
    main()
