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
    p.add_argument('--b', type=int, default=0,
                   help='batch mode: A/B the vmapped rulebook (model '
                        'path until round 4) vs the flat-scatter batched '
                        'rulebook at each GGA stage shape')
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from gga_tpu.utils.env import setup_compilation_cache
    setup_compilation_cache()
    from gga_tpu.ops import sparse as S

    if args.b:
        return batch_mode(args)

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


def batch_mode(args):
    """A/B at batch --b: vmapped rulebook + flatten_rulebook (the model
    path until round 4) vs downsample_rulebook_batched (flat scatters),
    plus the vmapped enum+sort floor, at each GGA strided-conv shape."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gga_tpu.utils.env import setup_compilation_cache
    setup_compilation_cache()
    from gga_tpu.models.layers import flatten_rulebook
    from gga_tpu.ops import sparse as S

    B = args.b
    rng = np.random.RandomState(0)
    STAGES = [  # (N_in, out_budget, in_grid)
        (16000, 16000, (41, 1600, 1408)),
        (16000, 14000, (21, 800, 704)),
        (14000, 12000, (11, 400, 352)),
    ]

    def scan_time(fn, xs_all):
        """Slope between 1 and --k scan steps; each step consumes a
        DISTINCT coords batch from xs_all [K, B, N, 3] so nothing is
        loop-invariant (a closed-over batch lets XLA hoist the whole
        rulebook out of the loop — the round-3 'rulebook is cheap'
        reading fell for exactly that)."""
        import time
        times = {}
        for k in (1, args.k):
            @jax.jit
            def run(xs):
                def body(carry, c):
                    out = jax.tree_util.tree_leaves(fn(c))[0]
                    return carry + out.astype(jnp.float32).sum() * 1e-12, 0
                s, _ = jax.lax.scan(body, jnp.zeros(()), xs)
                return s
            xs = xs_all[:k]
            jax.block_until_ready(run(xs))
            t0 = time.perf_counter()
            for _ in range(3):
                out = run(xs)
            jax.block_until_ready(out)
            times[k] = (time.perf_counter() - t0) / 3
        return max((times[args.k] - times[1]) / (args.k - 1), 1e-9)

    for si, (n, bud, grid) in enumerate(STAGES):
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

        def vmapped(cb):
            def one(c, v):
                st = S.SparseTensor(jnp.zeros((n, 1), jnp.float32),
                                    c, v, grid)
                return S.downsample_rulebook(st, (3, 3, 3), (2, 2, 2),
                                             (1, 1, 1), bud)
            oc, ov, og, fm, bm = jax.vmap(
                one, out_axes=(0, 0, None, 0, 0))(cb, validj)
            fm_f, bm_f = flatten_rulebook(fm, bm, n)
            return fm_f + bm_f[:, :fm_f.shape[1]]

        def batched(cb):
            oc, ov, og, fm_f, bm_f = S.downsample_rulebook_batched(
                cb, validj, grid, (3, 3, 3), (2, 2, 2), (1, 1, 1), bud)
            return fm_f + bm_f[:, :fm_f.shape[1]]

        def sort_floor(cb):
            ksz, st_a, pad_a, og, ds, big, K = S._ds_prep(
                grid, (3, 3, 3), (2, 2, 2), (1, 1, 1), n)
            keys, pay, newv, slot, ok, _ = jax.vmap(
                lambda c, v: S._ds_pairs(c, v, ksz, st_a, pad_a,
                                         og, ds, big, K))(cb, validj)
            return keys + pay + slot

        def pieces(cb, which):
            """floor + a subset of the three scatters, for attribution."""
            ksz, st_a, pad_a, og, ds, big, K = S._ds_prep(
                grid, (3, 3, 3), (2, 2, 2), (1, 1, 1), n)
            keys, pay, newv, slot, ok, _ = jax.vmap(
                lambda c, v: S._ds_pairs(c, v, ksz, st_a, pad_a,
                                         og, ds, big, K))(cb, validj)
            M = bud
            slot_ok = ok & (slot >= 0) & (slot < M)
            b_ix = jax.lax.broadcasted_iota(jnp.int32, keys.shape, 0)
            acc = keys[:, :1]
            k_arr = pay % K
            i_arr = pay // K
            if 'f' in which:
                fidx = jnp.where(slot_ok, k_arr * (B * M) + b_ix * M
                                 + slot, K * B * M).reshape(-1)
                fwd = jnp.full((K * B * M + 1,), -1, jnp.int32).at[
                    fidx].set((b_ix * n + i_arr).reshape(-1))
                acc = acc + fwd[:1]
            if 'b' in which:
                bidx = jnp.where(slot_ok, k_arr * (B * n) + b_ix * n
                                 + i_arr, K * B * n).reshape(-1)
                bwd = jnp.full((K * B * n + 1,), -1, jnp.int32).at[
                    bidx].set((b_ix * M + slot).reshape(-1))
                acc = acc + bwd[:1]
            if 'o' in which:
                oidx = jnp.where(newv & slot_ok, b_ix * M + slot,
                                 B * M).reshape(-1)
                out_lin = jnp.full((B * M + 1,), big, jnp.int32).at[
                    oidx].set(jnp.where(newv, keys, big).reshape(-1))
                acc = acc + out_lin[:1]
            return acc

        t_v = scan_time(vmapped, coords)
        t_b = scan_time(batched, coords)
        t_s = scan_time(sort_floor, coords)
        t_f = scan_time(lambda c: pieces(c, 'f'), coords)
        t_fb = scan_time(lambda c: pieces(c, 'fb'), coords)
        t_fbo = scan_time(lambda c: pieces(c, 'fbo'), coords)
        print(f'S{si} B={B} N={n} bud={bud}: vmapped {t_v * 1e3:7.3f} ms'
              f' | batched-flat {t_b * 1e3:7.3f} ms'
              f' | enum+sort floor {t_s * 1e3:7.3f} ms'
              f' | +fwd {t_f * 1e3:7.3f}'
              f' | +bwd {t_fb * 1e3:7.3f}'
              f' | +out {t_fbo * 1e3:7.3f}')


if __name__ == '__main__':
    main()
