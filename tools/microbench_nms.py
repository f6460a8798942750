"""Decompose the stage-3 decode+NMS cost (round-5 attribution: fwd 28.97
-> full 18.99 scenes/s, so NMS+merge = ~145 ms/batch-8 = 34% of the
inference step, while decode top-k is free).

Times each suspect on chip with the bench's trustworthy pattern (K-vs-1
scan slope over DISTINCT xs + host value fetch):
  - rotated_iou_bev on [100, 100]
  - _greedy_suppress fixpoint given a precomputed IoU
  - nms_bev whole (iou + fixpoint + ranking)
  - get_task_detections (vmap over batch, gathers + reorder)
  - merge_task_detections (concat of 3 tasks)
  - decode_detections whole (must reproduce the ~145 ms gap)

Usage: python tools/microbench_nms.py [--b 8] [--n 100]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--b', type=int, default=8)
    ap.add_argument('--n', type=int, default=100)
    ap.add_argument('--k', type=int, default=8)
    ap.add_argument('--cpu', action='store_true')
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update('jax_platforms', 'cpu')
    from gga_tpu.utils.env import setup_compilation_cache
    setup_compilation_cache()
    import jax.numpy as jnp
    import numpy as np

    from gga_tpu.core import nms as nms_mod
    from gga_tpu.core.rotated_iou import rotated_iou_bev
    from gga_tpu.models.dense_heads import centerpoint_head as cp
    from gga_tpu.models.detectors.centerpoint_gga import (GGAModelConfig,
                                                          decode_detections)

    B, N, K = args.b, args.n, args.k
    rng = np.random.RandomState(0)

    def boxes_batch(seed):
        r = np.random.RandomState(seed)
        b = np.zeros((B, N, 7), np.float32)
        b[..., 0] = r.uniform(0, 70, (B, N))
        b[..., 1] = r.uniform(-40, 40, (B, N))
        b[..., 2] = -1.0
        b[..., 3:6] = r.uniform(0.5, 4.5, (B, N, 3))
        b[..., 6] = r.uniform(-np.pi, np.pi, (B, N))
        s = r.rand(B, N).astype(np.float32)
        return b, s

    stack_b = jnp.stack([jnp.asarray(boxes_batch(s)[0]) for s in range(K)])
    stack_s = jnp.stack([jnp.asarray(boxes_batch(s)[1]) for s in range(K)])

    def slope(make_run, label):
        times = {}
        for kk in (1, K):
            run = make_run(kk)
            out = run(stack_b[:kk], stack_s[:kk])
            np.asarray(jax.device_get(
                jax.tree_util.tree_leaves(out)[0])).ravel()[:1]
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                out = run(stack_b[:kk], stack_s[:kk])
                np.asarray(jax.device_get(
                    jax.tree_util.tree_leaves(out)[0])).ravel()[:1]
                ts.append(time.perf_counter() - t0)
            ts.sort()
            times[kk] = ts[1]
        dt = max((times[K] - times[1]) / (K - 1), 1e-9)
        print(f'{label:36s} {dt * 1e3:9.3f} ms/batch{B}')
        return dt

    def scan_of(fn):
        def make(kk):
            @jax.jit
            def run(xb, xs):
                def body(c, x):
                    out = fn(x[0], x[1])
                    fold = sum(jnp.sum(v).astype(jnp.float32)
                               for v in jax.tree_util.tree_leaves(out))
                    return c + fold * 1e-12, ()
                c, _ = jax.lax.scan(body, jnp.zeros(()), (xb, xs))
                return c
            return run
        return make

    # 1. IoU matrix alone
    def iou_only(b, s):
        bev = b[..., [0, 1, 3, 4, 6]]
        return jax.vmap(lambda x: rotated_iou_bev(x, x))(bev)
    slope(scan_of(iou_only), 'rotated_iou_bev [B,N,N]')

    # 2. fixpoint alone (precomputed constant-ish iou folded in xs)
    def supp_only(b, s):
        bev = b[..., [0, 1, 3, 4, 6]]
        iou = jax.vmap(lambda x: rotated_iou_bev(x, x))(bev)
        return jax.vmap(lambda i, sc: nms_mod._greedy_suppress(
            i, sc, 0.2))(iou, s)
    slope(scan_of(supp_only), 'iou + _greedy_suppress')

    # 3. whole nms_bev
    def nms_whole(b, s):
        bev = b[..., [0, 1, 3, 4, 6]]
        return jax.vmap(lambda x, sc: nms_mod.nms_bev(
            x, sc, 0.2, post_max_size=N))(bev, s)
    slope(scan_of(nms_whole), 'nms_bev whole')

    # 4. get_task_detections (adds gathers/reorder around nms)
    def task_dets(b, s):
        d = dict(boxes=b, scores=s, labels=jnp.zeros((B, N), jnp.int32),
                 valid=s > 0.1, logits=s)
        return cp.get_task_detections(d, nms_thr=0.2, post_max_size=N)
    slope(scan_of(task_dets), 'get_task_detections (1 task)')

    # 5. three tasks + merge (the full decode tail minus decode_task)
    def three_merge(b, s):
        dets = [task_dets(b, s) for _ in range(3)]
        return cp.merge_task_detections(dets, (1, 1, 1))
    slope(scan_of(three_merge), '3x task NMS + merge')

    print('(full-step reference: fwd->full gap was ~145 ms/batch8)')


if __name__ == '__main__':
    main()
