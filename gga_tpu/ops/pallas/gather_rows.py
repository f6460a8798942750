"""Pallas TPU kernel prototype: row gather with VMEM-resident source.

EXPERIMENTAL (not wired into the sparse engine yet): the sparse-conv
engine's hot op is the neighbor row gather ``F[nmap]`` with
F [N<=16000, C] and ~27*N gathered rows (93% of the GGA train step sits
in the sparse encoder, CLAUDE.md breakdown). XLA lowers it to an HBM
gather; this kernel instead keeps F entirely in VMEM (16000 x 128 bf16
= 4 MB fits) and walks an SMEM-prefetched index tile with dynamic
scalar row loads, so each gathered row is a VMEM->VMEM copy.

``tools/microbench_gather.py`` measures it against the XLA gather; the
engine adopts it only if it wins on-chip (see the packed-gather negative
result in CLAUDE.md for why we measure before wiring).

MEASURED VERDICT (TPU v5e, scan-slope, 2026-08-17): NOT adopted.
- f32 N=16000 C=16, 431104 rows: XLA 1.095 ms vs this kernel 3.222 ms
  (~3x slower) — a fori_loop of 1-row VMEM copies is issue-rate bound
  and cannot beat XLA's native gather.
- bf16: does not compile — Mosaic requires dynamic dim-0 indices to be
  sublane-aligned ("cannot statically prove index is a multiple of 8");
  arbitrary gather indices violate bf16's 2-rows-per-sublane packing.
- XLA gather itself: C=16 bf16 0.779 ms (431k rows, ~13 MB) vs C=128
  bf16 0.544 ms (324k rows, ~83 MB) — element-rate bound at small C,
  byte-bound only at large C. Implication for the engine: widening
  channels per gathered row is nearly free; fewer, wider gathers win.
Kept as a reference point + harness for any future kernel attempt.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_M = 1024   # gathered rows per grid step (SMEM i32 tile = 1024 per XLA layout)


def _kernel(idx_ref, src_ref, out_ref):
    """idx [TILE_M] i32 (SMEM tile); src [N, C] (VMEM);
    out [TILE_M, C] (VMEM)."""
    def body(j, _):
        row = idx_ref[j]
        out_ref[pl.ds(j, 1), :] = src_ref[pl.ds(row, 1), :]
        return 0

    jax.lax.fori_loop(0, TILE_M, body, 0)


@functools.partial(jax.jit, static_argnames=('interpret',))
def gather_rows_pallas(src, idx, interpret=False):
    """src [N, C]; idx [M] int32 (M % TILE_M == 0) -> [M, C]."""
    m = idx.shape[0]
    assert m % TILE_M == 0, m
    grid = (m // TILE_M,)
    return pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE_M,), lambda i: (i,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(src.shape, lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((TILE_M, src.shape[1]),
                               lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((m, src.shape[1]), src.dtype),
        interpret=interpret,
    )(idx, src)


# ---------------------------------------------------------------------------
# Round-3 variants: probe whether ANY in-kernel form beats the 1-row
# fori_loop's ~7 ns/row issue rate (XLA's HBM gather: ~2.5 ns/row).
# Run tools/microbench_pallas_gather2.py before wiring anything in.
# ---------------------------------------------------------------------------


def _kernel_unroll(unroll, idx_ref, src_ref, out_ref):
    """Unrolled row copies: amortize loop control over `unroll` copies."""
    def body(j, _):
        base = j * unroll
        for u in range(unroll):
            row = idx_ref[base + u]
            out_ref[pl.ds(base + u, 1), :] = src_ref[pl.ds(row, 1), :]
        return 0

    jax.lax.fori_loop(0, TILE_M // unroll, body, 0)


@functools.partial(jax.jit, static_argnames=('unroll', 'interpret'))
def gather_rows_unroll(src, idx, unroll=8, interpret=False):
    m = idx.shape[0]
    assert m % TILE_M == 0, m
    return pl.pallas_call(
        functools.partial(_kernel_unroll, unroll),
        grid=(m // TILE_M,),
        in_specs=[
            pl.BlockSpec((TILE_M,), lambda i: (i,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(src.shape, lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((TILE_M, src.shape[1]),
                               lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((m, src.shape[1]), src.dtype),
        interpret=interpret,
    )(idx, src)


def _kernel_vec(idx_ref, src_ref, out_ref):
    """Vectorized fancy-index on a loaded VALUE: if Mosaic lowers
    jnp.take (lax.gather) on a VMEM-resident array to a hardware
    sublane-gather, this issues many descriptors per instruction."""
    out_ref[:] = jnp.take(src_ref[:], idx_ref[:], axis=0,
                          indices_are_sorted=False, fill_value=None)


@functools.partial(jax.jit, static_argnames=('interpret',))
def gather_rows_vec(src, idx, interpret=False):
    m = idx.shape[0]
    assert m % TILE_M == 0, m
    return pl.pallas_call(
        _kernel_vec,
        grid=(m // TILE_M,),
        in_specs=[
            pl.BlockSpec((TILE_M,), lambda i: (i,)),   # idx in VMEM
            pl.BlockSpec(src.shape, lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((TILE_M, src.shape[1]),
                               lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((m, src.shape[1]), src.dtype),
        interpret=interpret,
    )(idx, src)
