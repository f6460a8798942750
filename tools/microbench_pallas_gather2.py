"""Scan-slope probe: round-3 Pallas gather variants vs XLA gather.

The sparse engine is row-rate bound on gathers (~2.5 ns/row XLA, see
CLAUDE.md); the round-2 Pallas 1-row fori_loop kernel ran at ~7 ns/row
(issue bound).  This probes whether (a) unrolling the copy loop or
(b) a vectorized jnp.take on the VMEM-resident table changes the issue
rate.  Nothing gets wired into the engine unless a variant wins here
AND on the full train step (integration effects flip wins — see the
x-triple history in CLAUDE.md).
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--k', type=int, default=16, help='scan length')
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from gga_tpu.utils.env import setup_compilation_cache
    setup_compilation_cache()
    from gga_tpu.ops.pallas import gather_rows as gr

    rng = np.random.RandomState(0)
    for n, c, dtype in ((16000, 16, jnp.float32),
                        (16000, 32, jnp.float32),
                        (16000, 16, jnp.bfloat16)):
        m = 27 * n // gr.TILE_M * gr.TILE_M
        src = jnp.asarray(rng.randn(n, c), dtype)
        idx = jnp.asarray(rng.randint(0, n, m), jnp.int32)

        def scan_time(fn):
            def k_steps(k):
                @jax.jit
                def run(s):
                    def body(s, _):
                        out = fn(s, idx)
                        return s + out[:n] * 1e-9, out.sum()
                    _, outs = jax.lax.scan(body, s, None, length=k)
                    return outs
                return run
            times = {}
            for k in (1, args.k):
                f = k_steps(k)
                jax.block_until_ready(f(src))
                t0 = time.perf_counter()
                for _ in range(3):
                    out = f(src)
                jax.block_until_ready(out)
                times[k] = (time.perf_counter() - t0) / 3
            return max((times[args.k] - times[1]) / (args.k - 1), 1e-9)

        variants = [
            ('xla', lambda s, i: s[i]),
            ('fori1', gr.gather_rows_pallas),
            ('unroll4', lambda s, i: gr.gather_rows_unroll(s, i, 4)),
            ('unroll8', lambda s, i: gr.gather_rows_unroll(s, i, 8)),
            ('vec_take', gr.gather_rows_vec),
        ]
        parts = []
        ref = None
        for name, fn in variants:
            try:
                t = scan_time(fn)
                if ref is None:
                    ref = t
                parts.append(f'{name} {t * 1e3:7.3f} ms'
                             f' ({t / m * 1e9:4.1f} ns/row)')
                if name != 'xla':
                    out = fn(src, idx)
                    exp = src[idx]
                    assert jnp.allclose(out, exp), name
            except Exception as e:  # noqa: BLE001 - mosaic errors vary
                parts.append(f'{name} FAILED'
                             f' ({str(e).splitlines()[0][:60]})')
        print(f'N={n} C={c} {jnp.dtype(dtype).name} rows={m}:')
        for s in parts:
            print('   ', s)


if __name__ == '__main__':
    main()
