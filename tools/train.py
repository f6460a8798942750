"""Stage 2: GGA weak training.

Equivalent of /root/reference/tools/train.py + apis/train.py over a
data-parallel TPU mesh: one jitted train step, orbax checkpoints with
auto-resume, text logging, periodic checkpointing.

Usage:
    python tools/train.py configs/gga/gga_kitti.py \
        [--work-dir D] [--resume] [--max-steps N] \
        [--cfg-options k.ey=val ...]
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
    p.add_argument('--resume', action='store_true',
                   help='auto-resume from latest checkpoint in work dir')
    p.add_argument('--load-from', default=None,
                   help='weights-only init from a checkpoint dir')
    p.add_argument('--max-steps', type=int, default=None,
                   help='cap total steps (debug)')
    p.add_argument('--eval-info', default=None,
                   help='info pkl for periodic eval (EvalHook equivalent); '
                        'defaults to the train info')
    p.add_argument('--no-eval', action='store_true')
    p.add_argument('--cfg-options', nargs='*', default=[])
    return p.parse_args()


def init_multihost():
    """Wire jax.distributed from the launcher env (COORD/NPROC/PROC_ID —
    set per host by tools/dist_*.sh and tools/slurm_*.sh; the reference's
    init_dist analog, /root/reference/tools/train.py:174). Must run
    before any jax device use. No-op on a single host."""
    nproc = int(os.environ.get('NPROC', '1'))
    if nproc <= 1:
        return
    from gga_tpu.parallel.mesh import init_distributed
    init_distributed(coordinator_address=os.environ.get('COORD'),
                     num_processes=nproc,
                     process_id=int(os.environ.get('PROC_ID', '0')))


def main():
    args = parse_args()
    init_multihost()
    import jax
    import numpy as np

    from gga_tpu.config import Config
    from gga_tpu.data.dataset import KittiGGADataset
    from gga_tpu.data.sampler import GGADataBaseSampler
    from gga_tpu.models.builder import build_detector
    from gga_tpu.parallel.mesh import data_parallel_mesh, shard_batch
    from gga_tpu.train import checkpoints as ckpt
    from gga_tpu.train.loop import (create_train_state,
                                    make_jitted_train_step)
    from gga_tpu.train.optim import build_optimizer
    from gga_tpu.utils.env import setup_compilation_cache

    setup_compilation_cache()
    cfg = Config.fromfile(args.config)
    cfg.merge_from_options(
        dict(kv.split('=', 1) for kv in args.cfg_options))
    work_dir = args.work_dir or cfg.get('work_dir', './work_dirs/run')
    os.makedirs(work_dir, exist_ok=True)
    with open(os.path.join(work_dir, 'config_dump.py'), 'w') as f:
        f.write(cfg.dump())

    model, model_cfg = build_detector(cfg)

    d = cfg.data
    sampler = GGADataBaseSampler(
        os.path.join(cfg.data_root, d.db_info), cfg.data_root,
        classes=KittiGGADataset.CLASSES,
        sample_groups=d.db_sampler.sample_groups,
        rate=d.db_sampler.rate, prepare=d.db_sampler.prepare,
        seed=cfg.seed)
    dataset = KittiGGADataset(
        cfg.data_root, os.path.join(cfg.data_root, d.train_info),
        db_sampler=sampler, pc_range=cfg.point_cloud_range,
        num_points_range=d.num_points_range, pts_prefix=d.pts_prefix,
        max_points=d.max_points, max_objs=cfg.head.max_objs,
        max_cluster_pts=d.max_cluster_pts, min_distance=d.min_distance,
        seed=cfg.seed)

    mesh = data_parallel_mesh()
    n_dev = len(mesh.devices.reshape(-1))
    batch_size = d.samples_per_gpu * n_dev
    steps_per_epoch = max(len(dataset) // batch_size, 1)
    total_steps = steps_per_epoch * cfg.max_epochs
    if args.max_steps:
        total_steps = min(total_steps, args.max_steps)
    print(f'devices={n_dev} batch={batch_size} '
          f'steps/epoch={steps_per_epoch} total={total_steps}')

    tx = build_optimizer(total_steps=total_steps, **dict(cfg.optimizer))
    example = dataset[0]
    variables = model.init(
        jax.random.PRNGKey(cfg.seed), example['points'][None],
        example['points_valid'][None], train=False)
    n_params = sum(np.prod(p.shape) for p in
                   jax.tree_util.tree_leaves(variables['params']))
    print(f'params: {n_params / 1e6:.2f}M')
    state = create_train_state(model, variables, tx)

    ckpt_dir = os.path.join(work_dir, 'checkpoints')
    if args.resume:
        state, ok = ckpt.resume_from(ckpt_dir, state)
        print(f'resume: {"ok, step " + str(int(state.step)) if ok else "no checkpoint"}')
    elif args.load_from:
        state, ok = ckpt.load_from(args.load_from, state)
        print(f'load_from: {"ok" if ok else "no checkpoint"}')

    with mesh:
        step_fn = make_jitted_train_step(mesh, model_cfg.head)
        state = jax.device_put(state, jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec()))
        rng = jax.random.PRNGKey(cfg.seed + 1)

        log_path = os.path.join(work_dir, 'train_log.jsonl')
        step = int(state.step)
        t_last = time.perf_counter()
        done = False
        from gga_tpu.data.dataset import PrefetchLoader
        loader = PrefetchLoader(dataset, batch_size,
                                num_workers=cfg.get('loader_workers', 8),
                                seed=cfg.seed)
        for epoch in range(cfg.max_epochs):
            if done:
                break
            for batch in loader.epoch(epoch):
                batch.pop('gt_boxes', None)
                batch.pop('sample_idx', None)
                sb = shard_batch(mesh, batch)
                state, logs = step_fn(state, sb, rng)
                step += 1
                if step % cfg.log_interval == 0:
                    logs = {k: float(v) for k, v in logs.items()}
                    dt = (time.perf_counter() - t_last) / cfg.log_interval
                    t_last = time.perf_counter()
                    line = dict(step=step, epoch=epoch,
                                scenes_per_sec=batch_size / dt, **logs)
                    print(f'step {step} loss {logs["loss"]:.3f} '
                          f'({batch_size / dt:.1f} scenes/s)')
                    with open(log_path, 'a') as f:
                        f.write(json.dumps(line) + '\n')
                if args.max_steps and step >= args.max_steps:
                    done = True
                    break
            if (epoch + 1) % cfg.checkpoint_interval == 0 or done:
                ckpt.save_checkpoint(ckpt_dir, jax.device_get(state),
                                     step=step)
                print(f'saved checkpoint @ step {step}')
            if (not args.no_eval
                    and (epoch + 1) % cfg.get('eval_interval', 5) == 0):
                _run_eval(args, cfg, model, model_cfg, state, batch_size)
    print('training complete')


def _run_eval(args, cfg, model, model_cfg, state, batch_size):
    """Periodic KITTI eval (the reference's EvalHook,
    apis/train.py:287-308)."""
    import pickle

    from gga_tpu.eval.kitti_eval import kitti_eval
    from gga_tpu.eval.submission import detections_to_kitti_annos
    from gga_tpu.tools_lib import run_inference
    import jax
    import os

    info_path = os.path.join(
        cfg.data_root, args.eval_info or cfg.data.train_info)
    with open(info_path, 'rb') as f:
        infos = pickle.load(f)
    host_state = jax.device_get(state)
    dets = run_inference(model, model_cfg, host_state, cfg, infos,
                         batch_size)
    det_annos = detections_to_kitti_annos(
        dets, infos, class_names=('Pedestrian', 'Cyclist', 'Car'))
    gt_annos = [info['annos'] for info in infos]
    result, ret = kitti_eval(gt_annos, det_annos,
                             ['Pedestrian', 'Cyclist', 'Car'])
    print(result)


if __name__ == '__main__':
    main()
