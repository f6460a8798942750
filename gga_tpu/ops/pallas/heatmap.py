"""Pallas TPU kernel: gaussian heatmap target rendering.

Fused replacement for the scan-of-chunks renderer in
``gga_tpu.core.gaussian.render_heatmap`` (used every GGA train step, one
heatmap per task per sample): the [chunk, H, W] gaussian intermediates
never materialize — each [TH, W] heatmap tile stays resident in VMEM while
a fori_loop max-accumulates every object's contribution on the VPU.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_H = 8  # sublane-aligned tile height (float32 min tile is (8, 128))


def _kernel(centers_ref, radii_ref, valid_ref, out_ref):
    """centers [M, 2] i32 (SMEM), radii [M] i32, valid [M] i32;
    out [TILE_H, W] f32."""
    i = pl.program_id(0)
    th, w = out_ref.shape
    row0 = i * th
    rows = jax.lax.broadcasted_iota(jnp.int32, (th, w), 0) + row0
    cols = jax.lax.broadcasted_iota(jnp.int32, (th, w), 1)

    m = centers_ref.shape[0]

    def body(k, acc):
        cy = centers_ref[k, 1]
        r = radii_ref[k]
        v = valid_ref[k]
        # tile culling: skip objects whose square window misses these rows
        hit = (v > 0) & (cy + r >= row0) & (cy - r < row0 + th)

        def compute(acc):
            cx = centers_ref[k, 0]
            dx = cols - cx
            dy = rows - cy
            sigma = (2.0 * r.astype(jnp.float32) + 1.0) / 6.0
            g = jnp.exp(-(dx.astype(jnp.float32) ** 2
                          + dy.astype(jnp.float32) ** 2)
                        / (2.0 * sigma * sigma + 1e-12))
            inside = (jnp.abs(dx) <= r) & (jnp.abs(dy) <= r)
            return jnp.maximum(acc, jnp.where(inside, g, 0.0))

        return jax.lax.cond(hit, compute, lambda a: a, acc)

    out_ref[:] = jax.lax.fori_loop(0, m, body,
                                   jnp.zeros((th, w), jnp.float32))


@functools.partial(jax.jit, static_argnames=('hw', 'interpret'))
def render_heatmap_pallas(centers_int, radii, valid, hw, interpret=False):
    """Drop-in equivalent of core.gaussian.render_heatmap.

    Args:
        centers_int: [M, 2] int (x, y); radii [M] int; valid [M] bool.
        hw: static (H, W).

    Returns:
        [H, W] float32.
    """
    H, W = hw
    pad_h = (-H) % TILE_H
    pad_w = (-W) % 128
    Hp, Wp = H + pad_h, W + pad_w
    grid = (Hp // TILE_H,)
    out = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((TILE_H, Wp), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Hp, Wp), jnp.float32),
        interpret=interpret,
    )(centers_int.astype(jnp.int32), radii.astype(jnp.int32),
      valid.astype(jnp.int32))
    return out[:H, :W]
