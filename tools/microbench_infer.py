"""Scan-slope decomposition of the stage-3 inference step.

bench.py's pseudo-label-gen metric (fwd + decode + NMS at batch 8)
measures ~426 ms/batch8 while the train-profile forward accounts for
only ~275 ms (encoder 245 + vox 13 + dense ~15), implying ~150 ms in
decode/NMS. This tool isolates where: model fwd only, + decode_task
(top_k + gathers), + rotated NMS, vs the full decode_detections.

Reference analog: the stage-3 loop this step accelerates
(/root/reference/tools/generate_pseudo_labels_gga.py:133-264).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    import argparse
    p = argparse.ArgumentParser()
    p.add_argument('--k', type=int, default=5)
    p.add_argument('--b', type=int, default=8)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from gga_tpu.utils.env import setup_compilation_cache
    setup_compilation_cache()

    from bench import make_batch
    from gga_tpu.models.dense_heads import centerpoint_head as cp
    from gga_tpu.models.dense_heads.centerpoint_head_gga import GGAHeadConfig
    from gga_tpu.models.detectors.centerpoint_gga import (GGAModelConfig,
                                                          GGADetector,
                                                          decode_detections)

    B, K = args.b, args.k
    head = GGAHeadConfig(max_objs=500)
    cfg = GGAModelConfig(head=head, compute_dtype='bfloat16')
    model = GGADetector(cfg)
    batches = [make_batch(B, 20000, 500, 256, seed=s) for s in range(K)]
    variables = model.init(jax.random.PRNGKey(0), batches[0]['points'][:1],
                           batches[0]['points_valid'][:1], train=False)
    pts = jnp.stack([jnp.asarray(b['points']) for b in batches])
    pv = jnp.stack([jnp.asarray(b['points_valid']) for b in batches])

    def fold(tree):
        return sum(jnp.sum(v).astype(jnp.float32)
                   for v in jax.tree_util.tree_leaves(tree)) * 1e-12

    h = cfg.head

    def stage_fn(mode):
        def post(preds):
            if mode == 'fwd':
                return fold(preds)
            dets = []
            for tp in preds:
                d = cp.decode_task(
                    tp, voxel_size=h.voxel_size[:2],
                    pc_range=h.point_cloud_range,
                    out_size_factor=h.out_size_factor,
                    max_num=cfg.max_per_task,
                    score_threshold=cfg.score_threshold,
                    post_center_range=h.point_cloud_range)
                if mode == 'full':
                    d = cp.get_task_detections(
                        d, nms_thr=cfg.nms_thr,
                        post_max_size=min(cfg.post_max_size,
                                          cfg.max_per_task))
                dets.append(d)
            if mode == 'full':
                return fold(cp.merge_task_detections(dets, cfg.tasks))
            return fold(dets)
        return post

    def time_of_k(mode, k):
        post = stage_fn(mode)

        @jax.jit
        def run(v, xp, xv, eps):
            # eps varies per rep: identical (program, args) launches can
            # return anomalously fast on the remote-execution relay
            # (result caching suspected) — distinct args defeat it
            def body(c, x):
                preds = model.apply(v, x[0], x[1], train=False)
                return c + post(preds), ()
            c, _ = jax.lax.scan(body, eps, (xp[:k], xv[:k]))
            return c
        jax.block_until_ready(run(variables, pts, pv, jnp.float32(99.)))
        ts = []
        for r in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(run(variables, pts, pv,
                                      jnp.float32(r)))
            ts.append(time.perf_counter() - t0)
        ts.sort()
        return ts[1]

    def timed(name, mode):
        # sanity-bounded slope retry (bench.py): the relay sometimes
        # returns a multi-second program in ms — a slope implying
        # > 2000 scenes/s or <= 0 is a glitch, not a measurement.
        dt, tK = None, None
        for _ in range(3):
            t1 = time_of_k(mode, 1)
            tK = time_of_k(mode, K)
            dt = (tK - t1) / (K - 1)
            if dt > 0 and B / dt <= 2000.0:
                break
        else:
            dt = max(tK / K, 1e-9)
        print(f'{name:36s} {dt * 1e3:9.2f} ms/batch{B}')
        return dt

    t_f = timed('model fwd only', 'fwd')
    t_d = timed('fwd + decode_task (topk+gather)', 'decode')
    t_n = timed('fwd + decode + NMS + merge', 'full')
    print(f'  -> decode_task {1e3 * (t_d - t_f):.2f} ms, '
          f'NMS+merge {1e3 * (t_n - t_d):.2f} ms')


if __name__ == '__main__':
    main()
