"""Does vmap-ing the subm conv's gather cost 3x? (scan-slope, TPU)

tools/microbench_encoder_cum.py shows the real SparseBasicBlock costs
~5.5 ms vs ~1.7 ms for the same math benched unbatched — the only
structural difference is jax.vmap around subm_conv_with_map. This bench
compares, at N=16000 C=16 bf16:
  1. unbatched subm_conv_with_map            (the raw-op bench's shape)
  2. vmap(subm_conv_with_map) at B=1         (what the encoder runs)
  3. batch-FLATTENED subm at B=1: one gather on [B*N, C] with
     row-offset nmap (the candidate fix)
  4. vmap at B=8 vs flattened at B=8
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gga_tpu.utils.env import setup_compilation_cache
    setup_compilation_cache()
    from gga_tpu.ops import sparse as sp

    N, C = 16000, 16
    grid = (41, 1600, 1408)
    dt = jnp.bfloat16
    rng = np.random.RandomState(0)
    nz, ny, nx = grid

    def mk_scene(seed):
        r = np.random.RandomState(seed)
        lin = np.sort(r.choice(nz * ny * nx, N, replace=False)
                      .astype(np.int64))
        coords = np.stack([lin // (ny * nx), (lin % (ny * nx)) // nx,
                           lin % nx], -1).astype(np.int32)
        return coords

    w = jnp.asarray(rng.randn(27, C, C).astype(np.float32) * 0.1, dt)

    def bench(B, k=8):
        coords = jnp.asarray(np.stack([mk_scene(s) for s in range(B)]))
        valid = jnp.ones((B, N), bool)
        feats = jnp.asarray(rng.randn(B, N, C).astype(np.float32), dt)

        def mk_map(c, v):
            st = sp.SparseTensor(jnp.zeros((N, 1), jnp.float32), c, v,
                                 grid)
            return sp.build_neighbor_map(st)
        nmap, hit = jax.jit(jax.vmap(mk_map))(coords, valid)
        jax.block_until_ready(nmap)

        def timed(name, fn):
            times = {}
            for kk in (1, k):
                @jax.jit
                def run(c, kk=kk):
                    def body(c, _):
                        return fn(c), ()
                    c, _ = jax.lax.scan(body, c, None, length=kk)
                    return c
                out = run(jnp.zeros((), dt))
                jax.block_until_ready(out)
                t0 = time.perf_counter()
                for _ in range(5):
                    out = run(jnp.zeros((), dt))
                jax.block_until_ready(out)
                times[kk] = (time.perf_counter() - t0) / 5
            dtv = (times[k] - times[1]) / (k - 1)
            print(f'B={B} {name:24s} {dtv * 1e3:9.3f} ms')
            return dtv

        if B == 1:
            def f_plain(c):
                ff = feats[0] + jnp.minimum(c, 0).astype(dt)
                o = sp.subm_conv_with_map(ff, valid[0], nmap[0], hit[0],
                                          w)
                return jnp.minimum(o.sum(), 0).astype(dt)
            timed('unbatched', f_plain)

        def f_vmap(c):
            ff = feats + jnp.minimum(c, 0).astype(dt)
            o = jax.vmap(lambda f, v, m, h: sp.subm_conv_with_map(
                f, v, m, h, w))(ff, valid, nmap, hit)
            return jnp.minimum(o.sum(), 0).astype(dt)
        timed('vmap', f_vmap)

        # flattened: one [B*N, C] gather with row-offset map
        offs = (jnp.arange(B, dtype=jnp.int32) * N)[:, None, None]
        nmap_flat = (nmap + offs).transpose(1, 0, 2).reshape(27, B * N)
        hit_flat = hit.transpose(1, 0, 2).reshape(27, B * N)
        valid_flat = valid.reshape(B * N)

        def f_flat(c):
            ff = (feats + jnp.minimum(c, 0).astype(dt)).reshape(B * N, C)
            o = sp.subm_conv_with_map(ff, valid_flat, nmap_flat,
                                      hit_flat, w)
            return jnp.minimum(o.sum(), 0).astype(dt)
        timed('flattened', f_flat)

    bench(1)
    bench(8)


if __name__ == '__main__':
    main()
