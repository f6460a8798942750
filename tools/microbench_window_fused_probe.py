"""Diagnose the fused window conv's parity result (round 3).

microbench_window_conv measured the FUSED kernel at ~1.0x of the einsum
path while the gather-only kernel won 2.6-4.6x isolated. This probe
separates the suspects at each stage shape:
  - ovf: is window_prep tripping the XLA fallback (stage0 maxerr was
    exactly 0.0 — the cond's xla_path is bitwise-identical)?
  - t_gather: the gather-only kernel (_window_gather_t) alone
  - t_fused: the fused conv kernel (_window_conv) alone
  - t_xla: the XLA gather+einsum conv
If t_fused >> t_gather + GEMM, the (nbg, k) revisit grid order (window
DMAs re-issued per offset, no skip) is the regression; if ovf is True
the kernel never ran at all.
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
    valid0 = jnp.arange(N)[None, :] < vox['num_voxels'][:, None]
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
    K = 8

    def scan_time(fn, feats, w, bb, cols):
        # bb/cols/w passed as jit ARGUMENTS (large closed-over device
        # arrays bake into the HLO and can 413 the remote-compile POST)
        times = {}
        for kk in (1, K):
            @jax.jit
            def run(f, w_, bb_, cols_, kk=kk):
                def body(f, _):
                    out = fn(f, w_, bb_, cols_)
                    # shape-safe anti-CSE feedback: a scalar of the
                    # output folds into the carry regardless of shape
                    return f + (jnp.sum(out) * 1e-12).astype(f.dtype), ()
                f, _ = jax.lax.scan(body, f, None, length=kk)
                return f
            jax.block_until_ready(run(feats, w, bb, cols))
            t0 = time.perf_counter()
            for _ in range(3):
                out = run(feats, w, bb, cols)
            jax.block_until_ready(out)
            times[kk] = (time.perf_counter() - t0) / 3
        return max((times[K] - times[1]) / (K - 1), 1e-9)

    for s in (0, 1, 2, 3):
        coords, valid, grid, C = stages[s]
        nmap_flat, hit_flat = stage_maps(coords, valid, grid)
        feats = jnp.asarray(rng.randn(B * N, C).astype(np.float32),
                            jnp.bfloat16)
        w = jnp.asarray(rng.randn(27, C, C).astype(np.float32) * 0.1,
                        jnp.bfloat16)

        # overflow flag from window_prep (the fallback predicate)
        pack = wg.LANES // C
        window = wg._wg_for(C) * pack
        k_, q_ = nmap_flat.shape
        qp = (-q_) % (wg.GROUP * wg.TILE)
        nmap_p = jnp.pad(nmap_flat, ((0, 0), (0, qp)))
        hit_p = jnp.pad(hit_flat, ((0, 0), (0, qp)))
        f_pad = wg._pad_rows(feats, 2 * window)
        bb, cols, ovf = wg.window_prep(nmap_p, hit_p, f_pad.shape[0], C)
        fwide = f_pad.reshape(f_pad.shape[0] // pack, wg.LANES)
        # max window-relative col over hits (span diagnostic)
        maxcol = int(jnp.where(cols >= 0, cols, 0).max())

        def g_only(fw, _w, bb_, cols_):
            return wg._window_gather_t(fw, C, bb_, cols_)

        def fused(fw, w_, bb_, cols_):
            return wg._window_conv(fw, C, C, bb_, cols_, w_)

        t_g = scan_time(g_only, fwide, w, bb, cols)
        t_f = scan_time(fused, fwide, w, bb, cols)
        print(f'stage{s} C={C:3d}: ovf={bool(ovf)} maxcol={maxcol} '
              f'(cap={2 * window}) | gather-only {t_g * 1e3:7.3f} ms | '
              f'fused {t_f * 1e3:7.3f} ms')


if __name__ == '__main__':
    main()
