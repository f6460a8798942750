"""FCAF3D indoor training on SUN RGB-D (with GGA pseudo labels or GT).

Equivalent of training configs/fcaf3d/fcaf3d_8x2_sunrgbd-3d-10class.py in
the reference: AdamW (lr 1e-3, wd 1e-4), grad clip 10, step decay at
epochs 8 and 11 of 12 (mmdet3d fcaf3d schedule).

Fully config-driven like tools/train.py; flags override config values.

Usage:
    python tools/train_fcaf3d.py configs/gga/gga_sunrgbd.py \
        [--info PKL] [--tiny] [--max-steps N] [--cfg-options k=v ...]
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
        '..', 'configs', 'gga', 'gga_sunrgbd.py'))
    p.add_argument('--info', default=None,
                   help='override cfg.data.info')
    p.add_argument('--data-root', default=None)
    p.add_argument('--work-dir', default=None)
    p.add_argument('--batch-size', type=int, default=None)
    p.add_argument('--epochs', type=int, default=None)
    p.add_argument('--repeat', type=int, default=None,
                   help='RepeatDataset times (ref: 3)')
    p.add_argument('--lr', type=float, default=None)
    p.add_argument('--num-points', type=int, default=None)
    p.add_argument('--max-steps', type=int, default=None)
    p.add_argument('--tiny', action='store_true')
    p.add_argument('--cfg-options', nargs='*', default=[])
    return p.parse_args()


def main():
    args = parse_args()
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from gga_tpu.config import Config
    from gga_tpu.data.sunrgbd import SunRgbdDataset
    from gga_tpu.models.builder import build_detector
    from gga_tpu.models.dense_heads import fcaf3d_head as fh
    from gga_tpu.models.detectors.fcaf3d import (FCAF3DModelConfig,
                                                 FCAF3DDetector)
    from gga_tpu.parallel.mesh import data_parallel_mesh, shard_batch
    from gga_tpu.train import checkpoints as ckpt
    from gga_tpu.train.loop import TrainState
    from gga_tpu.utils.env import setup_compilation_cache

    setup_compilation_cache()
    c = Config.fromfile(args.config)
    c.merge_from_options(
        dict(kv.split('=', 1) for kv in args.cfg_options))
    work_dir = args.work_dir or c.get('work_dir',
                                      './work_dirs/sunrgbd_fcaf3d')
    os.makedirs(work_dir, exist_ok=True)
    if args.tiny:
        cfg = FCAF3DModelConfig.tiny()
        model = FCAF3DDetector(cfg)
    else:
        model, cfg = build_detector(c)

    info = args.info or c.data.info
    data_root = args.data_root or c.data.get('data_root', 'data/sunrgbd')
    num_points = args.num_points or c.data.get('num_points', 20000)
    ds = SunRgbdDataset(data_root, info, num_points=num_points,
                        max_objs=cfg.head.max_objs)
    mesh = data_parallel_mesh()
    n_dev = len(mesh.devices.reshape(-1))
    batch_size = args.batch_size or c.data.get('samples_per_gpu', 2) * n_dev
    epochs = args.epochs or c.get('max_epochs', 12)
    repeat = args.repeat or c.data.get('repeat', 3)
    steps_per_epoch = max(len(ds) * repeat // batch_size, 1)
    total_steps = steps_per_epoch * epochs
    if args.max_steps:
        total_steps = min(total_steps, args.max_steps)
    print(f'devices={n_dev} batch={batch_size} total={total_steps}')

    opt = c.get('optimizer', {})
    lr = args.lr or opt.get('lr', 0.001)
    gamma = opt.get('lr_gamma', 0.1)
    bounds = {steps_per_epoch * s: gamma
              for s in opt.get('lr_steps', (8, 11))}
    sched = optax.piecewise_constant_schedule(lr, bounds)
    tx = optax.chain(
        optax.clip_by_global_norm(opt.get('grad_clip', 10.0)),
        optax.adamw(sched, weight_decay=opt.get('weight_decay', 1e-4)))

    item = ds[0]
    variables = model.init(
        jax.random.PRNGKey(0), item['points'][None], item['colors'][None],
        item['points_valid'][None], train=False)
    params = variables['params']
    bstats = variables['batch_stats']
    opt_state = tx.init(params)
    n_params = sum(np.prod(p.shape) for p in
                   jax.tree_util.tree_leaves(params))
    print(f'params: {n_params / 1e6:.2f}M')

    from jax.sharding import NamedSharding, PartitionSpec as P
    repl = NamedSharding(mesh, P())
    bsh = NamedSharding(mesh, P('data'))

    def train_step(params, bstats, opt_state, batch):
        def loss_fn(p):
            outs, upd = model.apply(
                {'params': p, 'batch_stats': bstats}, batch['points'],
                batch['colors'], batch['points_valid'], train=True,
                mutable=['batch_stats'])
            total, logs = fh.loss(cfg.head, outs, batch['gt_boxes'],
                                  batch['gt_labels'], batch['obj_valid'])
            return total, (logs, upd['batch_stats'])

        (tot, (logs, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, new_opt = tx.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        logs['grad_norm'] = optax.global_norm(grads)
        return new_params, new_bs, new_opt, logs

    step_fn = jax.jit(train_step, in_shardings=(repl, repl, repl, bsh),
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
        for epoch in range(epochs * repeat):
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
                          f'({batch_size / dt:.1f} scenes/s)')
                    with open(log_path, 'a') as f:
                        f.write(json.dumps(dict(step=step, **logs)) + '\n')
                if args.max_steps and step >= args.max_steps:
                    done = True
                    break
            st = TrainState(step=jnp.asarray(step), params=params,
                            batch_stats=bstats, opt_state=opt_state,
                            tx=tx, apply_fn=model.apply)
            ckpt.save_checkpoint(ckpt_dir, jax.device_get(st), step=step)
    print('training complete')


if __name__ == '__main__':
    main()
