"""Sub-part decomposition of rotated_overlap (round-5: the [8,100,100]
IoU matrix costs ~48 ms on chip = the whole stage-3 NMS tail).

Times, at [B, N, N] pair grids: corner gen, edge-edge intersections,
contained-corner tests, centroid+angle, the 24-wide argsort +
take_along_axis, and the shoelace — plus the whole function — so the
rewrite targets the real cost.

Usage: python tools/microbench_rotated_iou.py [--b 8] [--n 100]
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

    from gga_tpu.core import rotated_iou as ri

    B, N, K = args.b, args.n, args.k
    rng = np.random.RandomState(0)
    xb = jnp.asarray(rng.rand(K, B, N, 5).astype(np.float32)
                     * np.asarray([70, 80, 4, 4, 6.28], np.float32))

    def slope(fn, label):
        times = {}
        for kk in (1, K):
            @jax.jit
            def run(xs):
                def body(c, x):
                    out = fn(x)
                    fold = sum(jnp.sum(v).astype(jnp.float32)
                               for v in jax.tree_util.tree_leaves(out))
                    return c + fold * 1e-12, ()
                c, _ = jax.lax.scan(body, jnp.zeros(()), xs)
                return c
            np.asarray(jax.device_get(run(xb[:kk])))
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                np.asarray(jax.device_get(run(xb[:kk])))
                ts.append(time.perf_counter() - t0)
            ts.sort()
            times[kk] = ts[1]
        dt = max((times[K] - times[1]) / (K - 1), 1e-9)
        print(f'{label:34s} {dt * 1e3:9.3f} ms/batch{B}')
        return dt

    def pair_setup(bx):
        b1 = jnp.broadcast_to(bx[:, :, None, :], (B, N, N, 5))
        b2 = jnp.broadcast_to(bx[:, None, :, :], (B, N, N, 5))
        return b1, b2

    def corners_only(bx):
        b1, b2 = pair_setup(bx)
        return ri._box_corners(b1, jnp), ri._box_corners(b2, jnp)

    def edges_only(bx):
        b1, b2 = pair_setup(bx)
        c1 = ri._box_corners(b1, jnp)
        c2 = ri._box_corners(b2, jnp)
        p = c1[..., :, None, :]
        r = (jnp.roll(c1, -1, axis=-2) - c1)[..., :, None, :]
        q = c2[..., None, :, :]
        s = (jnp.roll(c2, -1, axis=-2) - c2)[..., None, :, :]
        denom = ri._cross2(r, s)
        qp = q - p
        t = ri._cross2(qp, s) / jnp.where(denom == 0, 1.0, denom)
        u = ri._cross2(qp, r) / jnp.where(denom == 0, 1.0, denom)
        hit = ((jnp.abs(denom) > 1e-10) & (t >= 0) & (t <= 1)
               & (u >= 0) & (u <= 1))
        ipts = p + t[..., None] * r
        return ipts, hit

    def inbox_only(bx):
        b1, b2 = pair_setup(bx)
        c1 = ri._box_corners(b1, jnp)
        c2 = ri._box_corners(b2, jnp)
        return (ri._corners_in_box(c1, b2, jnp),
                ri._corners_in_box(c2, b1, jnp))

    def upto_sort(bx):
        """Everything except argsort/take/shoelace."""
        b1, b2 = pair_setup(bx)
        c1 = ri._box_corners(b1, jnp)
        c2 = ri._box_corners(b2, jnp)
        ipts, hit = edges_only(bx)
        ipts = ipts.reshape(B, N, N, 16, 2)
        hit = hit.reshape(B, N, N, 16)
        in12 = ri._corners_in_box(c1, b2, jnp)
        in21 = ri._corners_in_box(c2, b1, jnp)
        pts = jnp.concatenate([ipts, c1, c2], axis=-2)
        mask = jnp.concatenate([hit, in12, in21], axis=-1)
        count = mask.sum(axis=-1, keepdims=True)
        centroid = (pts * mask[..., None]).sum(-2, keepdims=True) \
            / jnp.maximum(count, 1)[..., None]
        ang = jnp.arctan2(pts[..., 1] - centroid[..., 1],
                          pts[..., 0] - centroid[..., 0])
        return jnp.where(mask, ang, 1e9), pts, mask, count

    def sort_only(bx):
        ang, pts, mask, count = upto_sort(bx)
        order = jnp.argsort(ang, axis=-1)
        pts_s = jnp.take_along_axis(pts, order[..., None], axis=-2)
        mask_s = jnp.take_along_axis(mask, order, axis=-1)
        return pts_s, mask_s

    def whole(bx):
        return jax.vmap(lambda b: ri.rotated_iou_bev(b, b))(bx)

    slope(corners_only, 'corners only')
    slope(edges_only, 'corners + edge intersections')
    slope(inbox_only, 'corners + in-box tests')
    slope(upto_sort, 'everything before argsort')
    slope(sort_only, '+ argsort/take (24-wide)')
    slope(whole, 'rotated_iou_bev whole')


if __name__ == '__main__':
    main()
