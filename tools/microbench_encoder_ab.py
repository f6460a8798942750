"""Whole-SparseEncoder fwd+bwd scan-slope at the bench's batch-8 shapes.

The window-kernel family (GGA_WINDOW_GATHER / GGA_WINDOW_CONV) wins its
isolated per-op microbenches but has lost EIGHT full-step A/Bs. This
tool measures the REAL SparseEncoder module (same flax code path as the
model, GGA KITTI budgets, bf16, B=8) fwd+bwd in one scanned program —
the intermediate granularity between "one conv" and "the whole train
step" — so the flip can be localized:

  - encoder-only ALSO flips  -> the loss is inside encoder composition
    (bisect stages next);
  - encoder-only wins        -> the interaction is with the dense stack /
    losses / optimizer that share the program (memory pressure).

Run twice, e.g.:
    python tools/microbench_encoder_ab.py
    GGA_WINDOW_CONV=1 GGA_WINDOW_CONV_CMAX=32 \
        python tools/microbench_encoder_ab.py
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--k', type=int, default=5)
    p.add_argument('--b', type=int, default=8)
    p.add_argument('--fwd-only', action='store_true')
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from gga_tpu.utils.env import setup_compilation_cache
    setup_compilation_cache()

    from bench import make_batch
    from gga_tpu.models.middle_encoders import SparseEncoder
    from gga_tpu.ops.voxelize import hard_voxelize

    B, K = args.b, args.k

    def vox(pts, pv):
        def one(pp, vv):
            out = hard_voxelize(
                pp, vv, voxel_size=(0.05, 0.05, 0.1),
                pc_range=(0, -40, -3, 70.4, 40, 1),
                max_points=5, max_voxels=16000)
            return (out['voxels'], out['coords'], out['num_points'],
                    out['num_voxels'])
        voxels, coords, npts, nvox = jax.vmap(one)(pts, pv)
        feats = voxels[..., :4].sum(-2) / jnp.maximum(
            npts[..., None], 1).astype(voxels.dtype)
        vvalid = jnp.arange(16000)[None, :] < nvox[:, None]
        return feats.astype(jnp.bfloat16), coords, vvalid

    # K distinct batches so nothing is loop-invariant
    fs, cs, vs = [], [], []
    for s in range(K):
        b = make_batch(B, 20000, 500, 256, seed=s)
        f, c, v = jax.jit(vox)(jnp.asarray(b['points']),
                               jnp.asarray(b['points_valid']))
        fs.append(f), cs.append(c), vs.append(v)
    feats = jnp.stack(fs)
    coords = jnp.stack(cs)
    vvalid = jnp.stack(vs)
    jax.block_until_ready(feats)

    enc = SparseEncoder(stage_budgets=(16000, 14000, 12000),
                        out_budget=12000)
    variables = enc.init(jax.random.PRNGKey(0), feats[0], coords[0],
                         vvalid[0], train=False)
    params = variables['params']
    rest = {k: v for k, v in variables.items() if k != 'params'}
    params = jax.device_put(params)

    def loss_fn(pp, f, c, v):
        out, _ = enc.apply({'params': pp, **rest}, f, c, v, train=True,
                           mutable=['batch_stats', 'diagnostics'])
        return jnp.sum(out.astype(jnp.float32) ** 2) * 1e-9

    def timed(name, step):
        times = {}
        for k in (1, K):
            @jax.jit
            def run(pp, k=k):
                def body(pp, x):
                    return step(pp, *x), ()
                pp, _ = jax.lax.scan(
                    body, pp, (feats[:k], coords[:k], vvalid[:k]))
                return pp
            jax.block_until_ready(run(params))
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                jax.block_until_ready(run(params))
                ts.append(time.perf_counter() - t0)
            ts.sort()
            times[k] = ts[1]
        dt = max((times[K] - times[1]) / (K - 1), 1e-9)
        print(f'{name:34s} {dt * 1e3:9.2f} ms/batch{B}')
        return dt

    def fwd_step(pp, f, c, v):
        return jax.tree_util.tree_map(
            lambda a: a + jnp.asarray(loss_fn(pp, f, c, v), a.dtype)
            * 1e-9, pp)

    def fwdbwd_step(pp, f, c, v):
        g = jax.grad(loss_fn)(pp, f, c, v)
        return jax.tree_util.tree_map(lambda a, b: a - 1e-9 * b, pp, g)

    gates = {k: os.environ.get(k, '') for k in
             ('GGA_WINDOW_CONV', 'GGA_WINDOW_CONV_CMAX',
              'GGA_WINDOW_GATHER', 'GGA_NMAP_HASH', 'GGA_SUBM_TRIPLE')}
    print('env gates:', {k: v for k, v in gates.items() if v})
    timed('encoder fwd', fwd_step)
    if not args.fwd_only:
        timed('encoder fwd+bwd', fwdbwd_step)


if __name__ == '__main__':
    main()
