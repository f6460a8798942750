"""Train-step phase decomposition with DISTINCT batches (round 5).

tools/microbench_step.py closes the batch over the scan body, so every
coords-dependent build (neighbor maps, strided rulebooks, voxelize) is
loop-invariant and XLA hoists it OUT of the measured loop — its phase
numbers are convs-only and under-attribute the step by the full build
cost (the round-3 rulebook trap, at step scale). This tool threads K
distinct batches through every phase:

  vox+VFE | builds-only (4 nmaps + 4 rulebooks at real per-stage
  coords) | encoder fwd | encoder fwd+bwd | dense 2D fwd+bwd |
  head targets+loss fwd | full train step

so the unattributed remainder (step - vox - enc fwd+bwd - dense - loss)
is the optimizer + true composition overhead, not hidden builds.
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--k', type=int, default=5)
    ap.add_argument('--batch', type=int, default=8)
    ap.add_argument('--phases', default='all',
                    help='comma list: vox,builds,enc,encb,dense,loss,step')
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from gga_tpu.utils.env import setup_compilation_cache
    setup_compilation_cache()

    from bench import make_batch
    from gga_tpu.models.dense_heads import centerpoint_head_gga as gga
    from gga_tpu.models.detectors.centerpoint_gga import (GGAModelConfig,
                                                          GGADetector)
    from gga_tpu.models.middle_encoders import SparseEncoder
    from gga_tpu.ops import sparse as sp
    from gga_tpu.ops.voxelize import hard_voxelize
    from gga_tpu.train.loop import create_train_state, gga_train_step
    from gga_tpu.train.optim import build_optimizer

    B, P, M, Pc, K = args.batch, 20000, 500, 256, args.k
    head = gga.GGAHeadConfig(max_objs=M)
    cfg = GGAModelConfig(head=head, compute_dtype='bfloat16')
    model = GGADetector(cfg)

    batches_np = [make_batch(B, P, M, Pc, seed=s) for s in range(K)]
    stacked = jax.device_put({
        k: jnp.stack([jnp.asarray(b[k]) for b in batches_np])
        for k in batches_np[0]})

    variables = model.init(
        jax.random.PRNGKey(0), batches_np[0]['points'][:1],
        batches_np[0]['points_valid'][:1], train=False)
    tx = build_optimizer(total_steps=10000)
    state = jax.device_put(create_train_state(model, variables, tx))
    rng = jax.random.PRNGKey(1)

    sel = (args.phases.split(',') if args.phases != 'all'
           else ['vox', 'builds', 'enc', 'encb', 'dense', 'loss',
                 'step'])

    def timed(name, fn, xs_all, carry0):
        times = {}
        for k in (1, K):
            @jax.jit
            def run(c0, xs):
                def body(c, x):
                    out = fn(c, x)
                    leaves = jax.tree_util.tree_leaves(out)
                    fb = sum(l.astype(jnp.float32).sum()
                             for l in leaves)
                    return c + (fb * 1e-12).astype(c.dtype), ()
                c, _ = jax.lax.scan(body, c0, xs)
                return jnp.sum(c).astype(jnp.float32)  # scalar to fetch
            xs = jax.tree_util.tree_map(lambda a: a[:k], xs_all)
            np.asarray(run(carry0, xs))   # warm + host fetch
            t0 = time.perf_counter()
            for _ in range(3):
                # fetching a host value is the only reliable completion
                # barrier on this relay (CLAUDE.md round-5 timing trap:
                # block_until_ready can return early for pure-dataflow
                # programs)
                np.asarray(run(carry0, xs))
            times[k] = (time.perf_counter() - t0) / 3
        dt = max((times[K] - times[1]) / (K - 1), 1e-9)
        print(f'{name:34s} {dt * 1e3:9.1f} ms/batch{B}'
              f'  ({dt * 1e3 / B:7.2f} ms/scene)')
        return dt

    # --- vox + VFE ---
    def vox_fn(pts, pv):
        def one(p, v):
            out = hard_voxelize(
                p, v, voxel_size=tuple(cfg.voxel_size),
                pc_range=tuple(cfg.point_cloud_range),
                max_points=cfg.max_points_per_voxel,
                max_voxels=cfg.max_voxels)
            return (out['voxels'], out['coords'], out['num_points'],
                    out['num_voxels'])
        voxels, coords, npts, nvox = jax.vmap(one)(pts, pv)
        feats = voxels[..., :4].sum(axis=-2) / jnp.maximum(
            npts[..., None], 1).astype(voxels.dtype)
        feats = feats.astype(jnp.bfloat16)
        vvalid = (jnp.arange(cfg.max_voxels)[None, :] < nvox[:, None])
        return feats, coords, vvalid

    if 'vox' in sel:
        timed('voxelize+VFE', lambda c, x: vox_fn(*x),
              (stacked['points'], stacked['points_valid']),
              jnp.zeros(()))

    # precompute vox outputs per scan step
    vouts = jax.jit(jax.vmap(vox_fn))(stacked['points'],
                                      stacked['points_valid'])
    jax.block_until_ready(vouts)

    enc = SparseEncoder(
        in_channels=4, base_channels=cfg.encoder_channels[0][0],
        sparse_shape=tuple(cfg.sparse_shape),
        output_channels=cfg.encoder_out_channels,
        encoder_channels=tuple(cfg.encoder_channels),
        encoder_paddings=tuple(cfg.encoder_paddings),
        stage_budgets=tuple(cfg.encoder_budgets),
        out_budget=cfg.encoder_out_budget)
    enc_vars = enc.init(jax.random.PRNGKey(0), vouts[0][:1, :1][0],
                        vouts[1][:1, :1][0], vouts[2][:1, :1][0],
                        train=False)

    GRIDS = [(41, 1600, 1408), (21, 800, 704), (11, 400, 352),
             (5, 200, 176)]  # kitti-config stage grids

    if 'builds' in sel:
        # real per-stage coords via return_stages (grid is static; only
        # coords/valid cross the jit boundary)
        enc_s = enc.clone(return_stages=True)

        @jax.jit
        def stage_coords(f, c, v):
            _, stages = enc_s.apply(enc_vars, f, c, v, train=False)
            return tuple((s[1], s[2]) for s in stages)
        scs = jax.vmap(stage_coords)(*vouts)   # per stage: [K, B, ...]
        jax.block_until_ready(scs)

        def builds_fixed(c, x):
            outs = []
            for si, g in enumerate(GRIDS):
                cc, vv = x[si]

                def one(c1, v1, g=g):
                    st = sp.SparseTensor(
                        jnp.zeros((c1.shape[0], 1), jnp.float32),
                        c1, v1, g)
                    return sp.build_neighbor_map(st)
                nm, ht = jax.vmap(one)(cc, vv)
                outs.append(nm)
                if si < 3:
                    r = sp.downsample_rulebook_compact(
                        cc, vv, g, (3, 3, 3), (2, 2, 2), (1, 1, 1),
                        cfg.encoder_budgets[si])
                    outs.append(r[3])
                    outs.append(r[4])
            return outs

        timed('builds (4 nmap + 3 rulebooks)', builds_fixed, scs,
              jnp.zeros(()))

    def enc_fwd(c, x):
        f, cc, vv = x
        return enc.apply(enc_vars, f, cc, vv, train=False)

    if 'enc' in sel:
        timed('sparse encoder fwd', enc_fwd, vouts, jnp.zeros(()))

    if 'encb' in sel:
        def enc_fb(c, x):
            f, cc, vv = x
            def loss(p):
                o = enc.apply({'params': p,
                               'batch_stats': enc_vars.get(
                                   'batch_stats', {})},
                              f, cc, vv, train=False)
                return jnp.sum(o.astype(jnp.float32) ** 2) * 1e-9
            return jax.grad(loss)(enc_vars['params'])
        timed('sparse encoder fwd+bwd', enc_fb, vouts, jnp.zeros(()))

    if 'step' in sel:
        def step_fn(s, b):
            s2, logs = gga_train_step(s, b, rng, cfg.head)
            return s2

        # carry the full state (exactly bench.py's shape)
        times = {}
        for k in (1, K):
            @jax.jit
            def run(s, xs):
                def body(s, b):
                    s2, logs = gga_train_step(s, b, rng, cfg.head)
                    return s2, logs['loss']
                s2, losses = jax.lax.scan(body, s, xs)
                return s2, losses
            xs = {key: v[:k] for key, v in stacked.items()}
            np.asarray(run(state, xs)[1])   # warm + host fetch
            t0 = time.perf_counter()
            for _ in range(3):
                np.asarray(run(state, xs)[1])
            times[k] = (time.perf_counter() - t0) / 3
        dt = (times[K] - times[1]) / (K - 1)
        print(f'{"full train step":34s} {dt * 1e3:9.1f} ms/batch{B}'
              f'  ({dt * 1e3 / B:7.2f} ms/scene)')


if __name__ == '__main__':
    main()
