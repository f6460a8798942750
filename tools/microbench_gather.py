"""Scan-slope microbenchmark: pallas VMEM row gather vs XLA gather.

Measures the sparse engine's hot access pattern (F [N, C] -> 27*N
gathered rows) at the GGA stage shapes. Decides whether the pallas
prototype (ops/pallas/gather_rows.py) should replace the XLA gather in
round 3.
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
    from gga_tpu.ops.pallas.gather_rows import gather_rows_pallas

    rng = np.random.RandomState(0)
    for n, c, dtype in ((16000, 16, jnp.float32),
                        (16000, 16, jnp.bfloat16),
                        (12000, 128, jnp.bfloat16)):
        from gga_tpu.ops.pallas.gather_rows import TILE_M
        m = 27 * n // TILE_M * TILE_M
        src = jnp.asarray(rng.randn(n, c), dtype)
        idx = jnp.asarray(rng.randint(0, n, m), jnp.int32)

        def scan_time(fn):
            def k_steps(k):
                @jax.jit
                def run(s):
                    def body(s, _):
                        out = fn(s, idx)
                        # fold output back to defeat CSE
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

        t_xla = scan_time(lambda s, i: s[i])
        try:
            t_pl = scan_time(lambda s, i: gather_rows_pallas(s, i))
            pl_str = f'pallas {t_pl * 1e3:8.3f} ms'
        except Exception as e:  # noqa: BLE001 - mosaic compile errors vary
            pl_str = f'pallas FAILED ({type(e).__name__}: '\
                     f'{str(e).splitlines()[0][:80]})'
        print(f'N={n} C={c} {jnp.dtype(dtype).name}: '
              f'xla {t_xla * 1e3:8.3f} ms   {pl_str}   ({m} rows)')


if __name__ == '__main__':
    main()
