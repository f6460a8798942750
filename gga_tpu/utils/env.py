"""Environment setup: persistent XLA compilation cache, logging.

The reference's setup_multi_processes / opencv thread pinning
(/root/reference/mmdet3d/utils/setup_env.py) has no TPU analog; what
matters here is amortizing the (slow, possibly remote) XLA compiles of the
big detector programs across processes.
"""
from __future__ import annotations

import os


def setup_compilation_cache(path='~/.cache/gga_tpu_xla'):
    """Enable JAX's persistent compilation cache."""
    import jax

    path = os.path.expanduser(path)
    os.makedirs(path, exist_ok=True)
    jax.config.update('jax_compilation_cache_dir', path)
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    return path
