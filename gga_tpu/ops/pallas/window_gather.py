"""Windowed one-hot row gather for MONOTONE index maps (Pallas TPU).

The sparse engine's hot op is the neighbor gather ``where(hit, F[nmap], 0)``
with F [R, C] and nmap [K, Q] (27 offsets x batch-flat rows). XLA lowers it
to an HBM row gather that is descriptor-rate bound (~2.8 ns/row measured,
CLAUDE.md); the round-2 Pallas scalar-copy kernel was 3x slower still
(ops/pallas/gather_rows.py verdict).

This kernel exploits the engine's SORTED invariant instead: per (scene,
offset) the neighbor ranks are a monotone function of the (sorted) output
rows, so the hits of any 128 consecutive outputs live in a small
contiguous window of F (measured spans on bench scenes: stage0 <= 128,
stage1 <= 451 rows per 128-row block). Per (offset, block) the kernel
reads an ALIGNED two-block window (via a scalar-prefetched block index)
and gathers within it using dense vector math — no per-row descriptors:

- F is viewed as wide rows [R/pack, 128] with pack = 128/C, so every
  window is a full 128-lane tile and windows are CONTIGUOUS in HBM
  (a lane-major transposed view was tried and its strided window DMA
  measured 0.16x of XLA at stage2 — sublane-major is mandatory).
- A one-hot [WG, TILE] per window half (window wide-row id == target
  wide row, broadcast along sublanes — the layout avoids every
  transpose) selects wide rows with two dot_generals whose stationary
  operand is the window (MXU-native transposed-lhs form).
- The C-lane segment inside the wide row is extracted with ``pack``
  masked sublane slices; misses are encoded as column -1 and match no
  one-hot row, yielding exact zeros — identical semantics to
  ``jnp.where(hit, F[nmap], 0)``.
- GROUP output blocks are processed per grid step (2*GROUP window refs)
  to amortize per-step pipeline overhead — at TILE=128 a 27-offset
  batch-flat gather is 27k blocks and per-step overhead dominated the
  ungrouped variant (1.17x/0.67x at stage0/1 vs XLA).
- Blocks with no hits repeat the previous window index, so the Pallas
  pipeline skips their DMA (on bench scenes most stage-0
  (offset, block) pairs are empty). Their compute is NOT predicated:
  the body is branchless because per-sub-block ``pl.when`` serialized
  the pipeline (12.9 vs 1.9 ms at stage1) — all-miss blocks flow
  through the same math and the empty one-hot yields exact zeros.

Output is TRANSPOSED per offset — [K, C, Q] — because the extraction
naturally produces [C, TILE] tiles; consumers contract it as
``einsum('kcn,kcd->nd')`` which costs XLA nothing.

Correctness is unconditional: the wrapper checks every hit fell inside
its aligned two-half window (capacity WG*pack+1 = 1025 original rows of
span at C<=32, 513 at C=64/128 — see _wg_for) and falls back to the XLA
gather via ``lax.cond`` otherwise, so odd data distributions can never
produce wrong values — only different speed.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
TILE = 128        # gathered rows per output block (one lane tile)
GROUP = 8         # output blocks per grid step


def _wg_for(c):
    """Window half size in WIDE rows: span capacity is WG*pack+1
    original rows, kept >= 1025 at C<=32 and >= 513 at C=64/128
    (measured bench-scene spans max out at 451/128-block)."""
    pack = LANES // c
    return 128 if pack >= 4 else (256 if pack == 2 else 512)


def _kernel(pack, c, wg, bb_ref, cols_ref, *refs):
    """One (offset k, block group jg) step — BRANCHLESS: per-sub-block
    ``pl.when`` predication measured 12.9 vs 1.9 ms at stage1 (the
    branches serialize Mosaic's pipeline); all-miss blocks flow through
    the same math and produce exact zeros via the empty one-hot.

    cols_ref: [1, 1, GROUP, TILE] int32 — original-row index relative to
        each sub-block's window base (bb * wg * pack); -1 for misses.
    refs: GROUP pairs of [wg, 128] wide-row window halves, then
        out_ref [1, C, GROUP*TILE].
    """
    out_ref = refs[-1]
    shift = pack.bit_length() - 1

    for g in range(GROUP):
        f0 = refs[2 * g]
        f1 = refs[2 * g + 1]
        cols = cols_ref[0, 0, g:g + 1, :]            # [1, TILE]
        # wide-row index within the 2*wg window; misses stay negative
        a = jax.lax.shift_right_arithmetic(cols, shift)   # [1, TILE]
        iota_w = jax.lax.broadcasted_iota(jnp.int32, (wg, TILE), 0)
        oh0 = (iota_w == a).astype(f0.dtype)              # [wg, TILE]
        oh1 = (iota_w + wg == a).astype(f0.dtype)
        # rw_t[l, i] = win[a_i, l]: transposed-lhs one-hot select
        dn = (((0,), (0,)), ((), ()))
        rw_t = (
            jax.lax.dot_general(f0[:], oh0, dn,
                                preferred_element_type=jnp.float32)
            + jax.lax.dot_general(f1[:], oh1, dn,
                                  preferred_element_type=jnp.float32)
        )                                                  # [128, TILE]
        if pack == 1:
            out = rw_t
        else:
            seg = cols & (pack - 1)                        # [1, TILE]
            out = jnp.zeros((c, TILE), jnp.float32)
            for s in range(pack):
                out = out + jnp.where(seg == s,
                                      rw_t[s * c:(s + 1) * c, :], 0.0)
        out_ref[0, :, g * TILE:(g + 1) * TILE] = out.astype(
            out_ref.dtype)


def _pad_rows(x, mult):
    r = x.shape[0]
    pad = (-r) % mult
    if pad:
        x = jnp.concatenate(
            [x, jnp.zeros((pad,) + x.shape[1:], x.dtype)])
    return x


@functools.partial(jax.jit, static_argnames=('c', 'interpret'))
def _window_gather_t(fwide, c, bb, cols, interpret=False):
    """fwide [Rw, 128] wide-row view (Rw % wg == 0); bb [K, nbg*GROUP]
    int32 window block index (in wg wide-row units, <= Rw/wg - 2);
    cols [K, nbg*GROUP*TILE] int32 window-relative original rows
    (-1 = miss). Returns [K, C, nbg*GROUP*TILE]."""
    c = int(c)
    k, nbb = bb.shape
    q = cols.shape[1]
    assert q == nbb * TILE and nbb % GROUP == 0
    nbg = nbb // GROUP
    pack = LANES // c
    wg = _wg_for(c)
    cols4 = cols.reshape(k, nbg, GROUP, TILE)

    win_specs = []
    for g in range(GROUP):
        for h in range(2):
            win_specs.append(pl.BlockSpec(
                (wg, LANES),
                functools.partial(
                    lambda ki, j, bb_ref, g, h:
                    (bb_ref[ki, j * GROUP + g] + h, 0), g=g, h=h),
                memory_space=pltpu.VMEM))

    out = pl.pallas_call(
        functools.partial(_kernel, pack, c, wg),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(k, nbg),
            in_specs=[
                pl.BlockSpec((1, 1, GROUP, TILE),
                             lambda ki, j, bb_ref: (ki, j, 0, 0),
                             memory_space=pltpu.VMEM),
            ] + win_specs,
            out_specs=pl.BlockSpec(
                (1, c, GROUP * TILE),
                lambda ki, j, bb_ref: (ki, 0, j)),
        ),
        out_shape=jax.ShapeDtypeStruct((k, c, q), fwide.dtype),
        interpret=interpret,
    )(bb, cols4, *([fwide] * (2 * GROUP)))
    return out


def _conv_kernel(pack, c, d, wg, nk, bb_ref, cols_ref, w_ref, *refs):
    """Fused submanifold conv step — OFFSETS-RESIDENT design: grid is
    (nb,) over output blocks only, and every offset's two window halves
    are separate input refs live in VMEM simultaneously (2*nk refs). As
    j sweeps, each offset's window index bb[k, j] is monotone
    nondecreasing, so its DMA re-issues only when the window actually
    moves — the gather-only kernel's locality — while the K-offset
    accumulation stays in registers and is written once per block. This
    removes both round-3/4 failure modes: the (nbg, K) grid's per-offset
    window re-issue (~1.0x) and the (K, nbg) grid's aliased HBM f32
    accumulator whose in/out dependency serialized the pipeline
    (0.55x at stage2).

    cols_ref: [1, nk, TILE] window-relative original rows (-1 = miss);
    w_ref: [nk, C, D] all offsets' weights (resident); refs: nk pairs of
    [wg, 128] window halves, then out_ref [TILE, D].
    """
    out_ref = refs[-1]
    shift = pack.bit_length() - 1
    acc = jnp.zeros((TILE, d), jnp.float32)
    iota_w = jax.lax.broadcasted_iota(jnp.int32, (wg, TILE), 0)
    dn = (((0,), (0,)), ((), ()))

    for k in range(nk):
        f0 = refs[2 * k]
        f1 = refs[2 * k + 1]
        cols = cols_ref[0, k:k + 1, :]                     # [1, TILE]
        a = jax.lax.shift_right_arithmetic(cols, shift)
        oh0 = (iota_w == a).astype(f0.dtype)
        oh1 = (iota_w + wg == a).astype(f0.dtype)
        rw_t = (
            jax.lax.dot_general(f0[:], oh0, dn,
                                preferred_element_type=jnp.float32)
            + jax.lax.dot_general(f1[:], oh1, dn,
                                  preferred_element_type=jnp.float32)
        )                                                  # [128, TILE]
        if pack == 1:
            g_t = rw_t
        else:
            seg = cols & (pack - 1)
            g_t = jnp.zeros((c, TILE), jnp.float32)
            for s in range(pack):
                g_t = g_t + jnp.where(seg == s,
                                      rw_t[s * c:(s + 1) * c, :], 0.0)
        # [TILE, D] += gathered^T @ W_k (bf16 inputs, f32 accumulation —
        # identical math to the einsum path modulo summation order)
        acc = acc + jax.lax.dot_general(
            g_t.astype(f0.dtype), w_ref[k], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    out_ref[:] = acc.astype(out_ref.dtype)


def _dw_kernel(pack, c, d, wg, bb_ref, cols_ref, dout_ref, *refs):
    """Fused dW step: dw[k] = sum_n gathered_f[k, :, n] dout[n, :],
    grid (K, nbg) with j innermost so dw[k] accumulates in VMEM.

    dout_ref: [GROUP*TILE, D]; refs: GROUP window-half pairs over the
    FEATURES, out_ref [1, C, D] (f32), acc scratch [C, D] f32.
    """
    out_ref = refs[-2]
    acc_ref = refs[-1]
    shift = pack.bit_length() - 1
    j = pl.program_id(1)
    # select, not multiply: uninitialized scratch can hold NaN
    acc = jnp.where(j == 0, 0.0, acc_ref[:])
    for g in range(GROUP):
        f0 = refs[2 * g]
        f1 = refs[2 * g + 1]
        cols = cols_ref[0, 0, g:g + 1, :]
        a = jax.lax.shift_right_arithmetic(cols, shift)
        iota_w = jax.lax.broadcasted_iota(jnp.int32, (wg, TILE), 0)
        oh0 = (iota_w == a).astype(f0.dtype)
        oh1 = (iota_w + wg == a).astype(f0.dtype)
        dn = (((0,), (0,)), ((), ()))
        rw_t = (
            jax.lax.dot_general(f0[:], oh0, dn,
                                preferred_element_type=jnp.float32)
            + jax.lax.dot_general(f1[:], oh1, dn,
                                  preferred_element_type=jnp.float32)
        )
        if pack == 1:
            g_t = rw_t
        else:
            seg = cols & (pack - 1)
            g_t = jnp.zeros((c, TILE), jnp.float32)
            for s in range(pack):
                g_t = g_t + jnp.where(seg == s,
                                      rw_t[s * c:(s + 1) * c, :], 0.0)
        dout_g = dout_ref[g * TILE:(g + 1) * TILE, :]      # [TILE, D]
        acc = acc + jax.lax.dot_general(
            g_t.astype(dout_g.dtype), dout_g, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    acc_ref[:] = acc
    out_ref[0] = acc


@functools.partial(jax.jit, static_argnames=('c', 'd', 'interpret'))
def _window_conv(fwide, c, d, bb, cols, weights, interpret=False):
    """Fused conv: returns [Q, D] — features conv'd with [K, C, D]
    weights over the windowed maps. Arguments as _window_gather_t plus
    weights; q must be a TILE multiple."""
    c, d = int(c), int(d)
    nk, nb = bb.shape
    q = cols.shape[1]
    assert q == nb * TILE
    pack = LANES // c
    wg = _wg_for(c)
    # [nb, nk, TILE] so the per-step block (1, nk, TILE) has its last
    # two dims equal to the array dims (Mosaic block-shape constraint)
    cols3 = cols.reshape(nk, nb, TILE).transpose(1, 0, 2)

    win_specs = []
    for k in range(nk):
        for h in range(2):
            win_specs.append(pl.BlockSpec(
                (wg, LANES),
                functools.partial(
                    lambda j, bb_ref, k, h: (bb_ref[k, j] + h, 0),
                    k=k, h=h),
                memory_space=pltpu.VMEM))

    return pl.pallas_call(
        functools.partial(_conv_kernel, pack, c, d, wg, nk),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nb,),
            in_specs=[
                pl.BlockSpec((1, nk, TILE),
                             lambda j, bb_ref: (j, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((nk, c, d),
                             lambda j, bb_ref: (0, 0, 0),
                             memory_space=pltpu.VMEM),
            ] + win_specs,
            out_specs=pl.BlockSpec(
                (TILE, d), lambda j, bb_ref: (j, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((q, d), fwide.dtype),
        interpret=interpret,
    )(bb, cols3, weights, *([fwide] * (2 * nk)))


@functools.partial(jax.jit, static_argnames=('c', 'd', 'interpret'))
def _window_dw(fwide, c, d, bb, cols, dout, interpret=False):
    """Fused dW: [K, C, D] f32 from the windowed feature gathers and
    dout [Q, D]."""
    c, d = int(c), int(d)
    k, nbb = bb.shape
    nbg = nbb // GROUP
    pack = LANES // c
    wg = _wg_for(c)
    cols4 = cols.reshape(k, nbg, GROUP, TILE)

    win_specs = []
    for g in range(GROUP):
        for h in range(2):
            win_specs.append(pl.BlockSpec(
                (wg, LANES),
                functools.partial(
                    lambda ki, j, bb_ref, g, h:
                    (bb_ref[ki, j * GROUP + g] + h, 0), g=g, h=h),
                memory_space=pltpu.VMEM))

    return pl.pallas_call(
        functools.partial(_dw_kernel, pack, c, d, wg),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(k, nbg),
            in_specs=[
                pl.BlockSpec((1, 1, GROUP, TILE),
                             lambda ki, j, bb_ref: (ki, j, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((GROUP * TILE, d),
                             lambda ki, j, bb_ref: (j, 0),
                             memory_space=pltpu.VMEM),
            ] + win_specs,
            out_specs=pl.BlockSpec(
                (1, c, d), lambda ki, j, bb_ref: (ki, 0, 0)),
            scratch_shapes=[pltpu.VMEM((c, d), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((k, c, d), jnp.float32),
        interpret=interpret,
    )(bb, cols4, dout, *([fwide] * (2 * GROUP)))


def window_prep(nmap, hit, r, c):
    """(bb, cols, ovf) for the kernel: per-block aligned window bases
    (empty blocks repeating the previous base so their DMA is skipped),
    window-relative columns (-1 = miss), and the fallback predicate."""
    k, qq = nmap.shape
    nb = qq // TILE
    pack = LANES // c
    window = _wg_for(c) * pack      # window alignment in ORIGINAL rows

    big = jnp.int32(2 ** 30)
    eff = jnp.where(hit, nmap.astype(jnp.int32), big)
    mn = eff.reshape(k, nb, TILE).min(-1)                     # [K, nb]
    nonempty = mn < big
    bb = jnp.clip(mn // window, 0, r // window - 2)
    jidx = jax.lax.broadcasted_iota(jnp.int32, (k, nb), 1)
    last = jax.lax.cummax(jnp.where(nonempty, jidx, -1), axis=1)
    bb = jnp.where(nonempty, bb,
                   jnp.take_along_axis(bb, jnp.maximum(last, 0), axis=1))
    cols = jnp.where(hit, nmap.astype(jnp.int32)
                     - jnp.repeat(bb * window, TILE, axis=1), -1)
    ovf = jnp.any(cols >= 2 * window)
    return bb, cols, ovf


def window_gather_t(features, nmap, hit, interpret=None):
    """``where(hit, features[nmap], 0)`` transposed to [K, C, Q].

    features: [R, C] with C a power-of-two divisor of 128 (>= 8);
    nmap/hit: [K, Q] with nmap MONOTONE nondecreasing over the hits of
    each row (the sparse engine's sorted-coords invariant guarantees
    this per scene/offset; scene boundaries in batch-flat maps keep
    global monotonicity). Exact for any input: blocks whose hit span
    exceeds the aligned window trigger an XLA-gather fallback for the
    whole call.
    """
    if interpret is None:
        # Mosaic is TPU-only; the test suite runs on a forced CPU mesh
        interpret = jax.default_backend() != 'tpu'
    k, q = nmap.shape
    r, c = features.shape
    assert LANES % c == 0, f'C={c} must divide {LANES}'
    pack = LANES // c
    window = _wg_for(c) * pack

    qp = (-q) % (GROUP * TILE)
    if qp:
        nmap = jnp.concatenate(
            [nmap, jnp.zeros((k, qp), nmap.dtype)], axis=1)
        hit = jnp.concatenate(
            [hit, jnp.zeros((k, qp), bool)], axis=1)
    qq = nmap.shape[1]

    f = _pad_rows(features, 2 * window)
    rr = f.shape[0]
    fwide = f.reshape(rr // pack, LANES)

    bb, cols, ovf = window_prep(nmap, hit, rr, c)

    def xla_path(_):
        g = jnp.where(hit.reshape(-1)[:, None],
                      features[jnp.maximum(nmap, 0).reshape(-1)], 0.0)
        return g.reshape(k, qq, c).transpose(0, 2, 1)

    def pallas_path(_):
        return _window_gather_t(fwide, c, bb, cols, interpret=interpret)

    out = jax.lax.cond(ovf, xla_path, pallas_path, None)
    return out[:, :, :q]
