"""Phase-level scan-slope breakdown of the GGA train step on TPU.

Phases (full-size config, batch 8):
  voxelize+VFE | sparse encoder | dense 2D (SECOND+FPN+head) |
  targets+loss | whole fwd | whole train step

Each phase is timed as the marginal cost of extra lax.scan iterations
(CLAUDE.md: per-launch timings are unreliable on this relay).

Usage: python tools/microbench_step.py [--phases a,b] [--fwdbwd]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--phases', default='all')
    ap.add_argument('--k', type=int, default=5)
    ap.add_argument('--batch', type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from gga_tpu.utils.env import setup_compilation_cache
    setup_compilation_cache()

    from bench import make_batch
    from gga_tpu.models.dense_heads import centerpoint_head_gga as gga
    from gga_tpu.models.detectors.centerpoint_gga import (GGAModelConfig,
                                                          GGADetector)
    from gga_tpu.models.backbones.second import SECOND
    from gga_tpu.models.necks.second_fpn import SECONDFPN
    from gga_tpu.models.dense_heads import centerpoint_head as cp
    from gga_tpu.models.middle_encoders import SparseEncoder
    from gga_tpu.models.voxel_encoders import HardSimpleVFE
    from gga_tpu.ops.voxelize import hard_voxelize
    from gga_tpu.train.loop import create_train_state, gga_train_step
    from gga_tpu.train.optim import build_optimizer

    B, P, M, Pc = args.batch, 20000, 128, 256
    head = gga.GGAHeadConfig(max_objs=M)
    cfg = GGAModelConfig(head=head, compute_dtype='bfloat16')
    model = GGADetector(cfg)
    batch_np = make_batch(B, P, M, Pc)
    batch = jax.device_put({k: jnp.asarray(v) for k, v in batch_np.items()})

    variables = model.init(jax.random.PRNGKey(0), batch['points'][:1],
                           batch['points_valid'][:1], train=False)
    tx = build_optimizer(total_steps=10000)
    state = jax.device_put(create_train_state(model, variables, tx))
    rng = jax.random.PRNGKey(1)

    def timed(name, fn, carry0):
        times = {}
        for k in (1, args.k):
            @jax.jit
            def run(c0, k=k):
                def body(c, _):
                    return fn(c), ()
                c, _ = jax.lax.scan(body, c0, None, length=k)
                return c
            out = run(carry0)
            jax.block_until_ready(out)
            t0 = time.perf_counter()
            reps = 3
            for _ in range(reps):
                out = run(carry0)
            jax.block_until_ready(out)
            times[k] = (time.perf_counter() - t0) / reps
        dt = (times[args.k] - times[1]) / (args.k - 1)
        print(f'{name:32s} {dt * 1e3:9.1f} ms/batch{B}'
              f'  ({dt * 1e3 / B:7.2f} ms/scene)')
        return dt

    sel = args.phases.split(',') if args.phases != 'all' else [
        'vox', 'encoder', 'encoder_bwd', 'dense', 'dense_bwd', 'loss',
        'fwd', 'step']

    f0 = jnp.zeros((), jnp.float32)

    def dep(c):
        return jnp.minimum(c, 0.0)

    # --- precompute phase inputs once ---
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
            npts[..., None], 1).astype(voxels.dtype)   # HardSimpleVFE
        feats = feats.astype(jnp.bfloat16)
        vvalid = (jnp.arange(cfg.max_voxels)[None, :] < nvox[:, None])
        return feats, coords, vvalid

    enc = SparseEncoder(
        in_channels=4, base_channels=cfg.encoder_channels[0][0],
        sparse_shape=tuple(cfg.sparse_shape),
        output_channels=cfg.encoder_out_channels,
        encoder_channels=tuple(cfg.encoder_channels),
        encoder_paddings=tuple(cfg.encoder_paddings),
        stage_budgets=tuple(cfg.encoder_budgets),
        out_budget=cfg.encoder_out_budget)
    feats, coords, vvalid = jax.jit(vox_fn)(batch['points'],
                                            batch['points_valid'])
    jax.block_until_ready(feats)
    enc_vars = enc.init(jax.random.PRNGKey(0), feats[:1], coords[:1],
                        vvalid[:1], train=False)
    enc_vars = jax.device_put(enc_vars)

    if 'vox' in sel:
        def f(c):
            ff, _, _ = vox_fn(batch['points'] + dep(c),
                              batch['points_valid'])
            return jnp.minimum(ff.sum().astype(jnp.float32), 0.0)
        timed('voxelize+VFE', f, f0)

    def enc_apply(vv, ff):
        out, _ = enc.apply(vv, ff, coords, vvalid, train=True,
                           mutable=['batch_stats'])
        return out

    if 'encoder' in sel:
        def f(c):
            bev = enc_apply(enc_vars, feats + dep(c).astype(feats.dtype))
            return jnp.minimum(bev.sum().astype(jnp.float32), 0.0)
        timed('sparse encoder fwd', f, f0)

    if 'encoder_bwd' in sel:
        def loss_fn(p, ff):
            bev = enc_apply({'params': p,
                             'batch_stats': enc_vars['batch_stats']}, ff)
            return bev.astype(jnp.float32).sum()

        def f(c):
            g = jax.grad(loss_fn)(enc_vars['params'],
                                  feats + dep(c).astype(feats.dtype))
            return jnp.minimum(
                sum(x.sum() for x in jax.tree.leaves(g)).astype(
                    jnp.float32), 0.0)
        timed('sparse encoder fwd+bwd', f, f0)

    # dense stack: SECOND + FPN + head on a fixed BEV input
    bev0 = jax.jit(lambda: enc_apply(enc_vars, feats))()
    jax.block_until_ready(bev0)

    second = SECOND(in_channels=bev0.shape[-1],
                    out_channels=tuple(cfg.backbone_channels),
                    layer_nums=tuple(cfg.backbone_layers),
                    layer_strides=tuple(cfg.backbone_strides))
    fpn = SECONDFPN(in_channels=tuple(cfg.backbone_channels),
                    out_channels=tuple(cfg.neck_channels),
                    upsample_strides=tuple(cfg.neck_strides))
    headm = cp.CenterHead(tasks=tuple(cfg.tasks), in_channels=512,
                          share_conv_channel=cfg.share_conv_channel)

    def dense_fwd(variables, bev, train=True):
        sv, fv, hv = variables
        xs, s_upd = second.apply(sv, bev, train=train,
                                 mutable=['batch_stats'])
        fused, f_upd = fpn.apply(fv, xs, train=train,
                                 mutable=['batch_stats'])
        preds, h_upd = headm.apply(hv, fused, train=train,
                                   mutable=['batch_stats'])
        return preds

    sv = second.init(jax.random.PRNGKey(0), bev0, train=False)
    xs0 = second.apply(sv, bev0, train=False)
    fv = fpn.init(jax.random.PRNGKey(0), xs0, train=False)
    fused0 = fpn.apply(fv, xs0, train=False)
    hv = headm.init(jax.random.PRNGKey(0), fused0, train=False)
    dvars = jax.device_put((sv, fv, hv))

    if 'dense' in sel:
        def f(c):
            preds = dense_fwd(dvars, bev0 + dep(c).astype(bev0.dtype))
            return jnp.minimum(
                preds[0]['heatmap'].sum().astype(jnp.float32), 0.0)
        timed('dense 2D stack fwd', f, f0)

    if 'dense_bwd' in sel:
        def loss_fn(vv, bev):
            preds = dense_fwd(vv, bev)
            return sum(p['heatmap'].astype(jnp.float32).sum()
                       for p in preds)

        def f(c):
            g = jax.grad(loss_fn)(dvars,
                                  bev0 + dep(c).astype(bev0.dtype))
            return jnp.minimum(
                sum(x.sum() for x in jax.tree.leaves(g)).astype(
                    jnp.float32), 0.0)
        timed('dense 2D stack fwd+bwd', f, f0)

    if 'loss' in sel:
        preds0 = jax.jit(lambda: dense_fwd(dvars, bev0))()
        jax.block_until_ready(jax.tree.leaves(preds0)[0])

        def f(c):
            preds = jax.tree.map(
                lambda x: x + dep(c).astype(x.dtype), preds0)
            targets = gga.build_targets(
                head, jax.random.PRNGKey(2), batch['labels'],
                batch['obj_valid'], batch['init_pseudo'],
                batch['boxes_img'], batch['bdry_masks'],
                batch['lidar2img'])
            total, _ = gga.loss(head, preds, targets, batch['ibp_xy'],
                                batch['ibp_valid'])
            return jnp.minimum(total.astype(jnp.float32), 0.0)
        timed('targets+loss fwd', f, f0)

    if 'fwd' in sel:
        def f(c):
            preds, _ = state.apply_fn(
                {'params': state.params,
                 'batch_stats': state.batch_stats},
                batch['points'] + dep(c), batch['points_valid'],
                train=True, mutable=['batch_stats'])
            return jnp.minimum(
                preds[0]['heatmap'].sum().astype(jnp.float32), 0.0)
        timed('model fwd', f, f0)

    if 'step' in sel:
        def f(carry):
            s, c = carry
            b2 = dict(batch)
            b2['points'] = batch['points'] + dep(c)
            s2, logs = gga_train_step(s, b2, rng, head)
            return (s2, jnp.minimum(logs['loss'].astype(jnp.float32), 0.0))
        timed('full train step', f, (state, f0))


if __name__ == '__main__':
    main()
