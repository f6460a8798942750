"""Scan-slope decomposition of sparse_conv_fast's strided rulebook.

Times, at the GGA stage-0 downsample shape (N=16000 inputs, D=8
feasible candidates, 128k sorted pairs, out budget 14000):
  1. the full downsample_rulebook
  2. the raw 2-array jax.lax.sort it contains
  3. a packed int64 single-array variant of that sort
  4. the rulebook conv (gather+GEMM) given precomputed maps
so the round-3 sort-shaving work targets the real hotspot.
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--k', type=int, default=16)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from gga_tpu.utils.env import setup_compilation_cache
    setup_compilation_cache()
    from gga_tpu.ops import sparse as S

    N, C, BUD = 16000, 16, 14000
    grid = (41, 1600, 1408)
    rng = np.random.RandomState(0)
    # plausible surface-ish scene: cluster points on a few planes
    pts = np.unique(
        rng.randint(0, np.asarray(grid), (N * 2, 3)).astype(np.int32)
        // np.asarray([1, 2, 2], np.int32)
        * np.asarray([1, 2, 2], np.int32), axis=0)[:N]
    nvox = pts.shape[0]
    coords = np.full((N, 3), -1, np.int32)
    coords[:nvox] = pts
    feats = rng.randn(N, C).astype(np.float32)
    st = S.from_voxels(jnp.asarray(feats), jnp.asarray(coords),
                       jnp.asarray(nvox), grid)
    w = jnp.asarray(rng.randn(27, C, 32).astype(np.float32)) * 0.05

    def scan_time(fn, init):
        def k_steps(k):
            @jax.jit
            def run(x):
                def body(x, _):
                    out = fn(x)
                    leaf = jax.tree_util.tree_leaves(out)[0]
                    return x + leaf.astype(x.dtype).sum() * 1e-12, 0
                s, _ = jax.lax.scan(body, x, None, length=k)
                return s
            return run
        times = {}
        for k in (1, args.k):
            f = k_steps(k)
            jax.block_until_ready(f(init))
            t0 = time.perf_counter()
            for _ in range(3):
                out = f(init)
            jax.block_until_ready(out)
            times[k] = (time.perf_counter() - t0) / 3
        return max((times[args.k] - times[1]) / (args.k - 1), 1e-9)

    # 1. full rulebook build (perturb features argument only -> the
    #    coords path is loop-invariant; perturb coords instead)
    def full_rb(x):
        stx = S.SparseTensor(features=st.features,
                             coords=(st.coords + x.astype(jnp.int32) * 0),
                             valid=st.valid, grid=st.grid)
        oc, ov, og, fm, bm = S.downsample_rulebook(
            stx, (3, 3, 3), (2, 2, 2), (1, 1, 1), BUD)
        return fm
    t_rb = scan_time(full_rb, jnp.zeros((), jnp.float32))

    # 2. raw pair sort: 2-array int32, 8N keys
    D = 8
    keys0 = jnp.asarray(rng.randint(0, 2 ** 27, D * N), jnp.int32)
    pay0 = jnp.asarray(np.arange(D * N), jnp.int32)

    def pair_sort(x):
        k2, p2 = jax.lax.sort(
            (keys0 + x.astype(jnp.int32), pay0), num_keys=1)
        return k2 + p2
    t_sort = scan_time(pair_sort, jnp.zeros((), jnp.float32))

    # 3. single-array int32 sort of the same keys (no payload)
    def single_sort(x):
        return jax.lax.sort(keys0 + x.astype(jnp.int32))
    t_single = scan_time(single_sort, jnp.zeros((), jnp.float32))

    # 3b. dense slot map: scatter BUD slot ids into a [big] grid, gather
    #     D*N pair slots back (payload-free slot recovery)
    big = 21 * 800 * 704
    out_lin0 = jnp.asarray(
        np.sort(rng.choice(big, BUD, replace=False)).astype(np.int32))
    pair_lin0 = jnp.asarray(rng.randint(0, big, D * N), jnp.int32)

    def dense_slot(x):
        slot_of = jnp.full((big,), -1, jnp.int32).at[
            out_lin0 + x.astype(jnp.int32)].set(
            jnp.arange(BUD, dtype=jnp.int32))
        return slot_of[pair_lin0]
    t_grid = scan_time(dense_slot, jnp.zeros((), jnp.float32))

    # 4. conv on a fixed rulebook (gather + GEMM fwd only)
    oc, ov, og, fm, bm = jax.jit(
        lambda: S.downsample_rulebook(
            st, (3, 3, 3), (2, 2, 2), (1, 1, 1), BUD))()
    jax.block_until_ready(fm)

    def rb_conv(x):
        return S.rulebook_conv(st.features + x, w, fm, bm, ov)
    t_conv = scan_time(rb_conv, jnp.zeros((), jnp.float32))

    print(f'nvox={nvox} pairs={D * N}')
    print(f'downsample_rulebook : {t_rb * 1e3:8.3f} ms')
    print(f'pair sort (2xi32)   : {t_sort * 1e3:8.3f} ms')
    print(f'single sort (i32)   : {t_single * 1e3:8.3f} ms')
    print(f'dense slot map      : {t_grid * 1e3:8.3f} ms')
    print(f'rulebook_conv fwd   : {t_conv * 1e3:8.3f} ms')


if __name__ == '__main__':
    main()
