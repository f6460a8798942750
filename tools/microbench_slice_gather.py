"""Is a (3, C)-slice gather ~3x cheaper per fetched row than 1-row
gathers? (scan-slope, TPU)

XLA row gathers are descriptor-rate bound (~550 M rows/s,
tools/microbench_gather.py). The subm conv's 27 offsets group into 9
x-triples with CONSECUTIVE target linear ids, so their matches sit in a
3-row contiguous table window — one gather descriptor with
slice_sizes=(3, C) fetches all three. This bench times, at the
flattened stage-0 shape (N=128000 rows, C=16 bf16):
  1. 27N single-row gathers  (current subm cost model)
  2. 9N (3, C)-slice gathers (the x-triple scheme)
  3. 9N single-row gathers   (descriptor-count control)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gga_tpu.utils.env import setup_compilation_cache
    setup_compilation_cache()

    N, C = 128000, 16
    dt = jnp.bfloat16
    rng = np.random.RandomState(0)
    src = jnp.asarray(rng.randn(N, C).astype(np.float32), dt)
    idx27 = jnp.asarray(rng.randint(0, N, 27 * N), jnp.int32)
    idx9 = jnp.asarray(rng.randint(0, N - 3, 9 * N), jnp.int32)

    def timed(name, fn, k=8):
        times = {}
        for kk in (1, k):
            @jax.jit
            def run(c, kk=kk):
                def body(c, _):
                    out = fn(src + c)
                    return c + out.sum() * jnp.asarray(1e-12, dt), ()
                c, _ = jax.lax.scan(body, c, None, length=kk)
                return c
            out = run(jnp.zeros((), dt))
            jax.block_until_ready(out)
            t0 = time.perf_counter()
            for _ in range(5):
                out = run(jnp.zeros((), dt))
            jax.block_until_ready(out)
            times[kk] = (time.perf_counter() - t0) / 5
        dtv = (times[k] - times[1]) / (k - 1)
        print(f'{name:28s} {dtv * 1e3:9.3f} ms')
        return dtv

    timed('27N row gathers', lambda s: s[idx27])

    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2), collapsed_slice_dims=(),
        start_index_map=(0,))

    def slice_gather(s):
        return jax.lax.gather(
            s, idx9[:, None], dnums, slice_sizes=(3, C),
            mode=jax.lax.GatherScatterMode.CLIP)

    timed('9N (3,C)-slice gathers', slice_gather)
    timed('9N row gathers', lambda s: s[idx9])


if __name__ == '__main__':
    main()
