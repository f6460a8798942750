"""Benchmark: GGA weak-training step throughput on one TPU chip.

Runs the full-size KITTI GGA config (voxel grid 1408x1600x40, 16k voxels,
SparseEncoder -> SECOND -> SECONDFPN -> CenterHead + GGA losses + AdamW)
on synthetic KITTI-shaped scenes and reports steady-state scenes/sec/chip.

Baseline: the PyTorch reference trains SECOND-class models at ~40
samples/s on 8x V100 => 5 scenes/s per GPU
(/root/reference/docs/en/benchmarks.md:17-23; BASELINE.md). The driver
north star is >= 5x that per chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import time

import numpy as np


def make_batch(B, P, M, Pc, seed=0):
    rng = np.random.RandomState(seed)
    # KITTI-like scene: ~P points in the front-camera frustum
    x = rng.uniform(0, 70.4, (B, P, 1))
    y = (rng.uniform(-0.45, 0.45, (B, P, 1)) * (x + 8))
    z = rng.uniform(-2.5, 0.5, (B, P, 1))
    r = rng.rand(B, P, 1)
    pts = np.concatenate([x, y, z, r], -1).astype(np.float32)
    valid = np.ones((B, P), bool)

    n_obj = 24
    labels = np.full((B, M), -1, np.int32)
    labels[:, :n_obj] = rng.randint(0, 3, (B, n_obj))
    obj_valid = np.zeros((B, M), bool)
    obj_valid[:, :n_obj] = True
    pseudo = np.zeros((B, M, 7), np.float32)
    pseudo[:, :n_obj, 0] = rng.uniform(5, 65, (B, n_obj))
    pseudo[:, :n_obj, 1] = rng.uniform(-35, 35, (B, n_obj))
    pseudo[:, :n_obj, 2] = -1.0
    pseudo[:, :n_obj, 3:5] = rng.uniform(0.5, 4.5, (B, n_obj, 2))
    pseudo[:, :n_obj, 5] = rng.uniform(1.2, 2.0, (B, n_obj))
    boxes_img = np.zeros((B, M, 4), np.float32)
    boxes_img[:, :n_obj, 0] = rng.uniform(0, 600, (B, n_obj))
    boxes_img[:, :n_obj, 1] = rng.uniform(100, 250, (B, n_obj))
    boxes_img[:, :n_obj, 2] = boxes_img[:, :n_obj, 0] + rng.uniform(
        30, 400, (B, n_obj))
    boxes_img[:, :n_obj, 3] = boxes_img[:, :n_obj, 1] + rng.uniform(
        20, 120, (B, n_obj))
    bdry = np.zeros((B, M, 4), bool)
    l2i = np.zeros((B, M, 4, 4), np.float32)
    l2i[..., 0, 0] = 721.5
    l2i[..., 1, 1] = 721.5
    l2i[..., 0, 2] = 609.6
    l2i[..., 1, 2] = 172.9
    l2i[..., 2, 2] = 1.0
    l2i[..., 3, 3] = 1.0
    ibp = np.zeros((B, M, Pc, 2), np.float32)
    ibp[:, :n_obj] = pseudo[:, :n_obj, None, :2] + rng.randn(
        B, n_obj, Pc, 2).astype(np.float32)
    ibp_valid = np.zeros((B, M, Pc), bool)
    ibp_valid[:, :n_obj, :64] = True
    return dict(points=pts, points_valid=valid, labels=labels,
                obj_valid=obj_valid, init_pseudo=pseudo,
                boxes_img=boxes_img, bdry_masks=bdry, lidar2img=l2i,
                ibp_xy=ibp, ibp_valid=ibp_valid)


def main():
    import jax

    from gga_tpu.utils.env import setup_compilation_cache
    setup_compilation_cache()

    from gga_tpu.models.dense_heads.centerpoint_head_gga import GGAHeadConfig
    from gga_tpu.models.detectors.centerpoint_gga import (GGAModelConfig,
                                                          GGADetector)
    from gga_tpu.train.loop import create_train_state
    from gga_tpu.train.optim import build_optimizer

    import os
    B = int(os.environ.get('GGA_BENCH_B', 8))  # scenes per step (per chip)
    P = 20000             # reduced-cloud points per scene
    M = 500               # padded object slots (reference max_objs,
                          # gga_kitti_config.py:72)
    Pc = 256              # padded cluster points per object
    K = 5                 # distinct batches threaded through the scan

    head = GGAHeadConfig(max_objs=M)
    # GGA_BENCH_TILE='1,2,3' runs those encoder stages on the dense-tile
    # engine (ops/tile_conv.py) for the A/B against the row engine
    tile_env = os.environ.get('GGA_BENCH_TILE', '')
    tile_stages = tuple(int(s) for s in tile_env.split(',') if s)
    cfg = GGAModelConfig(head=head, compute_dtype='bfloat16',
                         encoder_tile_stages=tile_stages,
                         remat_encoder=bool(
                             int(os.environ.get('GGA_BENCH_REMAT', '0'))))
    model = GGADetector(cfg)
    batch_np = make_batch(B, P, M, Pc)

    variables = model.init(
        jax.random.PRNGKey(0), batch_np['points'][:1],
        batch_np['points_valid'][:1], train=False)
    tx = build_optimizer(total_steps=10000)
    state = create_train_state(model, variables, tx)

    # Measure K chained steps INSIDE one XLA program (lax.scan): this
    # machine's remote-execution relay makes per-launch python timing
    # unreliable (dispatch-only artifacts), so the per-step time is taken
    # as the slope between K=1 and K=K launches of a scanned step.
    import jax.numpy as jnp

    from gga_tpu.train.loop import gga_train_step

    # K DISTINCT batches stacked on a leading scan axis: a single batch
    # closed over the scan body is loop-invariant, letting XLA hoist
    # voxelize + rulebook construction out of the measured loop — with
    # per-step xs nothing host-side can be hoisted.
    batches_np = [make_batch(B, P, M, Pc, seed=s) for s in range(K)]
    stacked = jax.device_put({
        k: jnp.stack([jnp.asarray(b[k]) for b in batches_np])
        for k in batches_np[0]})
    state = jax.device_put(state)
    rng = jax.random.PRNGKey(1)

    def k_steps(k):
        xs = {key: v[:k] for key, v in stacked.items()}

        @jax.jit
        def run(s):
            def body(s, b):
                s2, logs = gga_train_step(s, b, rng, cfg.head)
                return s2, logs['loss']
            _, losses = jax.lax.scan(body, s, xs)
            return losses
        return run

    def _fetch(out):
        """Force a HOST VALUE round-trip. block_until_ready alone is not
        enough on this relay: fwd/decode-only infer programs 'complete'
        in ~0.2 ms while the multi-hundred-ms program still runs
        (round-5 attribution A/B measured 40817 scenes/s). device_get
        of an actual leaf value cannot return before execution."""
        leaves = jax.tree_util.tree_leaves(out)
        return np.asarray(jax.device_get(leaves[0])).ravel()[:1]

    def median_time(fn, *a, reps=3):
        """Median of per-rep wall times, each rep blocked by a host
        value fetch.

        The relay occasionally returns one launch anomalously fast
        (CLAUDE.md timing trap); a median over individually-blocked
        reps is robust to a single such glitch where a pipelined
        total/reps average is not.
        """
        _fetch(fn(*a))  # compile + warm
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            _fetch(fn(*a))
            ts.append(time.perf_counter() - t0)
        ts.sort()
        return ts[len(ts) // 2]

    def sane_slope(time_of_k, n_per_step, max_rate, attempts=3):
        """K-vs-1 scan slope with a sanity-bounded retry.

        If a glitched measurement implies a physically impossible rate
        (> max_rate items/s) or a non-positive slope, re-measure; as a
        last resort fall back to the amortized K-step program time,
        which upper-bounds the true marginal step time.
        """
        tK = None
        for _ in range(attempts):
            t1 = time_of_k(1)
            tK = time_of_k(K)
            dt = (tK - t1) / (K - 1)
            if dt > 0 and n_per_step / dt <= max_rate:
                return dt
        return max(tK / K, 1e-6)

    # GGA_BENCH_SKIP_TRAIN=1: measure only the inference metric (used
    # for the decode/NMS attribution A/B runs, which don't need the
    # train slope re-measured each time)
    skip_train = bool(int(os.environ.get('GGA_BENCH_SKIP_TRAIN', '0')))
    if not skip_train:
        dt = sane_slope(lambda k: median_time(k_steps(k), state),
                        B, max_rate=500.0)  # marginal step time
        scenes_per_sec = B / dt

    # GGA_BENCH_SKIP_INFER=1: train-metric-only run (halves the wall
    # time of train-side A/Bs, which pay a fresh ~10-15 min relay
    # compile per program variant)
    if bool(int(os.environ.get('GGA_BENCH_SKIP_INFER', '0'))):
        if not skip_train:
            print(json.dumps({
                'metric': 'gga_weak_train_scenes_per_sec_per_chip',
                'value': round(scenes_per_sec, 2),
                'unit': 'scenes/s',
                'vs_baseline': round(scenes_per_sec / 5.0, 2),
            }))
        return

    # --- second metric: stage-3 pseudo-label-gen throughput ---------
    # BASELINE.json's north-star metric is train + pseudo-gen; this is
    # the inference half: full-size forward + CenterPoint decode +
    # rotated NMS per batch, the device part of the reference's stage-3
    # loop (/root/reference/tools/generate_pseudo_labels_gga.py:133-264;
    # the host-side 2D matching runs offline afterwards in both stacks).
    from gga_tpu.models.detectors.centerpoint_gga import decode_detections

    infer_keys = ('points', 'points_valid')
    # GGA_BENCH_INFER_MODE: 'full' (default) = fwd + decode + NMS (the
    # stage-3 step); 'fwd' = model forward only; 'decode' = fwd +
    # decode_task top-k (no NMS) — the differences attribute the
    # decode/NMS shares with THIS harness's trustworthy timing
    # (tools/microbench_infer.py hits a relay broken-blocking
    # pathology this same process pattern somehow avoids).
    infer_mode = os.environ.get('GGA_BENCH_INFER_MODE', 'full')
    if infer_mode == 'decode':
        from gga_tpu.models.dense_heads import centerpoint_head as _cp

        def decode_only(c, preds):
            dets = []
            for tp in preds:
                dets.append(_cp.decode_task(
                    tp, voxel_size=c.head.voxel_size[:2],
                    pc_range=c.head.point_cloud_range,
                    out_size_factor=c.head.out_size_factor,
                    max_num=c.max_per_task,
                    score_threshold=c.score_threshold,
                    post_center_range=c.head.point_cloud_range))
            return dets

    def itime_of_k(k):
        xs = {key: stacked[key][:k] for key in infer_keys}

        @jax.jit
        def irun(s, xs):
            def body(carry, b):
                preds = s.apply_fn(
                    {'params': s.params, 'batch_stats': s.batch_stats},
                    b['points'], b['points_valid'], train=False)
                dets = (preds if infer_mode == 'fwd'
                        else decode_only(cfg, preds)
                        if infer_mode == 'decode'
                        else decode_detections(cfg, preds))
                fold = sum(jnp.sum(v).astype(jnp.float32)
                           for v in jax.tree_util.tree_leaves(dets))
                return carry + fold * 1e-12, ()
            c, _ = jax.lax.scan(body, jnp.zeros(()), xs)
            return c
        return median_time(irun, state, xs)

    dti = sane_slope(itime_of_k, B, max_rate=2000.0)
    infer_sps = B / dti

    # No published reference number exists for the stage-3 loop
    # (BASELINE.json "published" is empty); 20 scenes/s/V100 is the
    # documented estimate: 4x the 5/s train rate, the typical
    # fwd-only : fwd+bwd+opt ratio for SECOND-class models.
    print(json.dumps({
        'metric': 'gga_pseudo_label_gen_scenes_per_sec_per_chip',
        'value': round(infer_sps, 2),
        'unit': 'scenes/s',
        'vs_baseline': round(infer_sps / 20.0, 2),
    }))

    if not skip_train:
        baseline = 5.0  # reference scenes/s per V100 (benchmarks.md)
        print(json.dumps({
            'metric': 'gga_weak_train_scenes_per_sec_per_chip',
            'value': round(scenes_per_sec, 2),
            'unit': 'scenes/s',
            'vs_baseline': round(scenes_per_sec / baseline, 2),
        }))


if __name__ == '__main__':
    main()
