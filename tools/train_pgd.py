"""Stage 4: PGD monocular retraining on pseudo labels.

Equivalent of ``dist_train.sh configs/gga/gga_pdg.py 8`` in the reference:
trains the PGD monocular detector on the pseudo-labelled infos (stage 3
output), SGD + step decay + warmup over a data-parallel mesh. Fully
config-driven like tools/train.py; flags override config values.

Usage:
    python tools/train_pgd.py configs/gga/gga_pdg.py \
        [--info PKL] [--max-steps N] [--tiny] [--cfg-options k=v ...]
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
    p.add_argument('config', nargs='?', default=os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        '..', 'configs', 'gga', 'gga_pdg.py'))
    p.add_argument('--info', default=None,
                   help='override cfg.data.info (pseudo-label pkl)')
    p.add_argument('--data-root', default=None)
    p.add_argument('--work-dir', default=None)
    p.add_argument('--batch-size', type=int, default=None)
    p.add_argument('--epochs', type=int, default=None)
    p.add_argument('--lr', type=float, default=None)
    p.add_argument('--max-steps', type=int, default=None)
    p.add_argument('--resume', action='store_true')
    p.add_argument('--tiny', action='store_true')
    p.add_argument('--min-score', type=float, default=None,
                   help='filter pseudo labels below this score')
    p.add_argument('--cfg-options', nargs='*', default=[])
    return p.parse_args()


def main():
    args = parse_args()
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from gga_tpu.config import Config
    from gga_tpu.data.kitti.mono_dataset import KittiMonoDataset
    from gga_tpu.models.builder import build_detector
    from gga_tpu.models.dense_heads import pgd_head as ph
    from gga_tpu.models.detectors.pgd import PGDModelConfig, PGDDetector
    from gga_tpu.parallel.mesh import data_parallel_mesh, shard_batch
    from gga_tpu.train import checkpoints as ckpt
    from gga_tpu.utils.env import setup_compilation_cache

    setup_compilation_cache()
    c = Config.fromfile(args.config)
    c.merge_from_options(
        dict(kv.split('=', 1) for kv in args.cfg_options))
    work_dir = args.work_dir or c.get('work_dir', './work_dirs/kitti_pgd')
    os.makedirs(work_dir, exist_ok=True)
    if args.tiny:
        cfg = PGDModelConfig.tiny()
        model = PGDDetector(cfg)
    else:
        model, cfg = build_detector(c)

    info = args.info or c.data.info
    data_root = args.data_root or c.data.get('data_root', 'data/kitti')
    min_score = (args.min_score if args.min_score is not None
                 else c.data.get('min_score'))
    ds = KittiMonoDataset(data_root, info, min_score=min_score)
    mesh = data_parallel_mesh()
    n_dev = len(mesh.devices.reshape(-1))
    batch_size = args.batch_size or c.data.samples_per_gpu * n_dev
    epochs = args.epochs or c.get('max_epochs', 48)
    steps_per_epoch = max(len(ds) // batch_size, 1)
    total_steps = steps_per_epoch * epochs
    if args.max_steps:
        total_steps = min(total_steps, args.max_steps)
    print(f'devices={n_dev} batch={batch_size} total={total_steps}')

    # SGD + linear warmup + step decay (gga_pdg.py:152-166)
    opt = c.get('optimizer', {})
    lr = args.lr or opt.get('lr', 0.001)
    warmup = opt.get('warmup_iters', 500)
    gamma = opt.get('lr_gamma', 0.1)
    bounds = [steps_per_epoch * s for s in opt.get('lr_steps', (32, 44))]
    sched = optax.join_schedules([
        optax.linear_schedule(lr * opt.get('warmup_ratio', 1 / 3), lr,
                              warmup),
        optax.piecewise_constant_schedule(
            lr, {max(b - warmup, 1): gamma for b in bounds}),
    ], [warmup])
    tx = optax.chain(optax.clip_by_global_norm(opt.get('grad_clip', 35.0)),
                     optax.sgd(sched, momentum=opt.get('momentum', 0.9)),
                     optax.add_decayed_weights(
                         opt.get('weight_decay', 1e-4)))

    item = ds[0]
    variables = model.init(jax.random.PRNGKey(0), item['image'][None],
                           train=False)
    params = variables['params']
    bstats = variables.get('batch_stats', {})
    opt_state = tx.init(params)
    n_params = sum(np.prod(p.shape) for p in
                   jax.tree_util.tree_leaves(params))
    print(f'params: {n_params / 1e6:.2f}M')

    fsz = [(item['image'].shape[0] // s, item['image'].shape[1] // s)
           for s in cfg.head.strides]
    pts = ph.level_points(cfg.head, fsz)
    points = jnp.concatenate(pts)
    strides_flat = jnp.concatenate([
        jnp.full((p.shape[0],), s, jnp.float32)
        for p, s in zip(pts, cfg.head.strides)])
    regress_flat = jnp.concatenate([
        jnp.broadcast_to(jnp.asarray(r, jnp.float32), (p.shape[0], 2))
        for p, r in zip(pts, cfg.head.regress_ranges)])

    from jax.sharding import NamedSharding, PartitionSpec as P
    repl = NamedSharding(mesh, P())
    bsh = NamedSharding(mesh, P('data'))

    def train_step(params, bstats, opt_state, batch):
        targets = jax.vmap(
            lambda b, l, c3, c2, d, v: ph.build_targets(
                cfg.head, points, strides_flat, regress_flat, b, l, c3,
                c2, d, v))(batch['gt_bboxes'], batch['gt_labels'],
                           batch['gt_cam3d'], batch['centers2d'],
                           batch['depths'], batch['obj_valid'])

        def loss_fn(p):
            (preds, fuse), upd = model.apply(
                {'params': p, 'batch_stats': bstats}, batch['image'],
                train=True, mutable=['batch_stats'])
            total, logs = ph.loss(cfg.head, preds, fuse, targets,
                                  batch['cam2img'], fsz)
            return total, (logs, upd['batch_stats'])

        (tot, (logs, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, new_opt = tx.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        logs['grad_norm'] = optax.global_norm(grads)
        return new_params, new_bs, new_opt, logs

    step_fn = jax.jit(train_step,
                      in_shardings=(repl, repl, repl, bsh),
                      donate_argnums=(0, 2))

    ckpt_dir = os.path.join(work_dir, 'checkpoints')
    log_path = os.path.join(work_dir, 'train_log.jsonl')
    step = 0
    t_last = time.perf_counter()
    with mesh:
        params = jax.device_put(params, repl)
        bstats = jax.device_put(bstats, repl)
        opt_state = jax.device_put(opt_state, repl)
        done = False
        for epoch in range(epochs):
            if done:
                break
            for batch in ds.epoch_batches(batch_size, seed=epoch):
                batch = shard_batch(mesh, batch)
                params, bstats, opt_state, logs = step_fn(
                    params, bstats, opt_state, batch)
                step += 1
                if step % 20 == 0:
                    logs = {k: float(v) for k, v in logs.items()}
                    dt = (time.perf_counter() - t_last) / 20
                    t_last = time.perf_counter()
                    print(f'step {step} loss {logs["loss"]:.3f} '
                          f'({batch_size / dt:.1f} img/s)')
                    with open(log_path, 'a') as f:
                        f.write(json.dumps(dict(step=step, **logs)) + '\n')
                if args.max_steps and step >= args.max_steps:
                    done = True
                    break
            # save via a minimal state-like namespace
            from gga_tpu.train.loop import TrainState
            st = TrainState(step=jnp.asarray(step), params=params,
                            batch_stats=bstats, opt_state=opt_state,
                            tx=tx, apply_fn=model.apply)
            ckpt.save_checkpoint(ckpt_dir, jax.device_get(st), step=step)
            print(f'saved checkpoint @ step {step}')
    print('training complete')


if __name__ == '__main__':
    main()
