"""Fully-supervised anchor-head training (SECOND / PointPillars).

The reference trains these through the same tools/train.py runner; here
the supervised path gets its own thin CLI over the registry: build the
detector from a config, stream KittiDetDataset batches, and run the
Anchor3DHead assign/loss under one pjit-ed step on the data mesh.

Usage:
    python tools/train_supervised.py \
        configs/second/hv_second_secfpn_6x8_80e_kitti-3d-3class.py \
        [--work-dir DIR] [--max-steps N] [--cfg-options k=v ...]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument('config')
    p.add_argument('--work-dir', default=None)
    p.add_argument('--max-steps', type=int, default=None)
    p.add_argument('--cfg-options', nargs='*', default=[])
    return p.parse_args()


def main():
    args = parse_args()
    import jax
    import jax.numpy as jnp
    import optax

    from gga_tpu.config import Config
    from gga_tpu.data.kitti_det import KittiDetDataset
    from gga_tpu.models.builder import build_detector
    from gga_tpu.models.dense_heads import anchor3d_head as ah
    from gga_tpu.parallel.mesh import data_parallel_mesh, shard_batch
    from gga_tpu.train import checkpoints as ckpt
    from gga_tpu.train.loop import TrainState
    from gga_tpu.train.optim import build_optimizer
    from gga_tpu.utils.env import setup_compilation_cache

    setup_compilation_cache()
    cfg = Config.fromfile(args.config)
    cfg.merge_from_options(
        dict(kv.split('=', 1) for kv in args.cfg_options))
    work_dir = args.work_dir or cfg.get('work_dir') \
        or './work_dirs/supervised'
    os.makedirs(work_dir, exist_ok=True)

    model, mc = build_detector(cfg)
    d = cfg.data
    ds = KittiDetDataset(
        cfg.data_root, os.path.join(cfg.data_root, d.train_info),
        pc_range=cfg.point_cloud_range, pts_prefix=d.pts_prefix,
        max_points=d.max_points, max_objs=d.get('max_objs', 64),
        seed=cfg.seed)

    mesh = data_parallel_mesh()
    n_dev = len(mesh.devices.reshape(-1))
    batch_size = d.samples_per_gpu * n_dev
    steps_per_epoch = max(len(ds) // batch_size, 1)
    total = args.max_steps or steps_per_epoch * cfg.max_epochs
    print(f'devices={n_dev} batch={batch_size} total_steps={total}')

    sample = ds.get_sample(0)
    variables = model.init(
        jax.random.PRNGKey(cfg.seed), sample['points'][None],
        sample['points_valid'][None], train=False)
    o = cfg.optimizer
    tx = build_optimizer(total_steps=total, lr=o.lr,
                         weight_decay=o.weight_decay,
                         grad_clip=o.grad_clip,
                         betas=tuple(o.get('betas', (0.95, 0.99))))
    state = TrainState(
        step=jnp.zeros((), jnp.int32), params=variables['params'],
        batch_stats=variables.get('batch_stats', {}),
        opt_state=tx.init(variables['params']), tx=tx,
        apply_fn=model.apply)

    def train_step(state, batch):
        def loss_fn(params):
            preds, mut = model.apply(
                {'params': params, 'batch_stats': state.batch_stats},
                batch['points'], batch['points_valid'], train=True,
                mutable=['batch_stats', 'diagnostics'])
            H, W = preds['cls'].shape[1:3]
            anchors = ah.make_anchors(mc.head, (H, W))
            targets = jax.vmap(
                lambda gb, gl, gv: ah.assign_targets(
                    mc.head, anchors, gb, gl, gv))(
                batch['gt_boxes'], batch['gt_labels'],
                batch['gt_valid'])
            tot, logs = ah.loss(mc.head, preds, anchors, targets)
            return tot, (logs, mut['batch_stats'])

        (tot, (logs, bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, opt = state.tx.update(grads, state.opt_state,
                                       state.params)
        params = optax.apply_updates(state.params, updates)
        return state.replace(step=state.step + 1, params=params,
                             batch_stats=bs, opt_state=opt), logs

    step_fn = jax.jit(train_step)
    state = jax.device_put(state)
    log_path = os.path.join(work_dir, 'train_log.jsonl')
    step = 0
    epoch = 0
    t0 = time.time()
    while step < total:
        ds.epoch = epoch
        for batch in ds.epoch_batches(batch_size, seed=epoch):
            batch.pop('sample_idx', None)
            with mesh:
                sb = shard_batch(mesh, {k: jnp.asarray(v)
                                        for k, v in batch.items()})
                state, logs = step_fn(state, sb)
            step += 1
            if step % cfg.get('log_interval', 50) == 0 or step == 1:
                rec = {k: float(v) for k, v in logs.items()}
                rec.update(step=step, epoch=epoch,
                           scenes_per_sec=batch_size * step
                           / max(time.time() - t0, 1e-6))
                print(f'step {step}: loss={rec["loss"]:.3f}')
                with open(log_path, 'a') as f:
                    f.write(json.dumps(rec) + '\n')
            if step >= total:
                break
        epoch += 1
        ckpt.save_checkpoint(os.path.join(work_dir, 'checkpoints'),
                             jax.device_get(state), step=step)
    print('training complete')


if __name__ == '__main__':
    main()
