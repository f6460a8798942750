"""Test configuration: run everything on a virtual 8-device CPU mesh.

Mirrors the reference's 'no cluster available' test reality (SURVEY.md §4):
multi-chip behavior is validated with
XLA_FLAGS=--xla_force_host_platform_device_count=8 on CPU.

NOTE: this environment boots an ``axon`` TPU PJRT plugin from
sitecustomize.py, which imports jax at interpreter start and pins
``jax_platforms=axon,cpu`` via jax.config — so env vars alone are too late;
the config must be overridden before the first backend use.
"""
import os

flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8').strip()
os.environ['JAX_PLATFORMS'] = 'cpu'

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', False)

assert jax.default_backend() == 'cpu'
assert len(jax.devices()) == 8
