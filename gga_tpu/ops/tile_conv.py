"""Dense-tile submanifold convolution: the TPU-native fast path.

The row engine (ops/sparse.py) is ROW-RATE bound: a 3x3x3 submanifold
conv gathers 27*N neighbor rows and XLA's gather streams ~550M rows/s
regardless of row width (CLAUDE.md round-2 measurements). This module
replaces the per-CELL neighbor exchange with a per-TILE one:

- Actives are scattered once per stage into dense ``(tz, ty, tx)`` tiles
  (``rows_to_tiles``): a [T, tz, ty, tx, C] array whose inactive cells
  are exact zeros, plus a [T, tz, ty, tx] active mask.
- A 3x3x3 subm conv becomes: gather the 26 neighbor tiles' facing
  slabs (26*T gather rows instead of 27*N — T is typically N/4..N/20),
  stitch them statically around the resident tile into a
  [T, tz+2, ty+2, tx+2, C] halo volume, run ONE dense ``lax.conv``
  (valid padding) on the MXU, and mask the output back to the active
  set (submanifold semantics). The dense-conv FLOP inflation
  (tile_cells * T / N, ~4-12x on surface scenes) is nearly free on the
  MXU; the gather-row reduction is the win.
- The backward is the SAME shape: d_in = halo-assemble(d_out) convolved
  with the flipped/transposed kernel (submanifold symmetry at tile
  granularity), so no scatter-adds appear anywhere (custom VJP, like
  ops/sparse.subm_conv_with_map).

Equivalence with the row engine is exact (same active set, same
arithmetic up to dense-conv reduction order) — see
tests/test_ops/test_tile_conv.py. Replaces the behavior of spconv's
SubMConv3d stacks consumed by the reference's SparseEncoder
(/root/reference/mmdet3d/models/middle_encoders/sparse_encoder.py) with
an architecture that has no reference counterpart.

All functions are single-scene; batch via vmap for the BUILD, then
flatten tiles/maps with ``flatten_tile_map`` and run convs on the
[B*T, ...] arrays (vmapped gathers are ~4x slower, CLAUDE.md).
"""
from __future__ import annotations

from typing import Tuple

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from . import sparse as sp


@flax.struct.dataclass
class TileMap:
    """Per-scene tile decomposition of a sorted active set."""
    tile_lin: jnp.ndarray    # [T] int32 sorted unique tile ids (pad=big)
    tvalid: jnp.ndarray      # [T] bool
    tnmap: jnp.ndarray       # [27, T] int32 neighbor-tile ranks
    thit: jnp.ndarray        # [27, T] bool
    rank: jnp.ndarray        # [N] int32 tile rank per row (miss -> T)
    slot: jnp.ndarray        # [N] int32 cell slot per row (z-major)
    cell_mask: jnp.ndarray   # [T, tz, ty, tx] bool active cells
    kept: jnp.ndarray        # [N] bool row survived the tile budget
    tile: Tuple[int, int, int] = flax.struct.field(pytree_node=False)


def build_tile_map(coords, valid, grid, tile=(4, 4, 4), t_budget=4096):
    """Decompose a sorted active set into dense tiles.

    Args:
        coords: [N, 3] int32 (z, y, x) sorted by cell linear id.
        valid: [N] bool.
        grid: (nz, ny, nx) cell grid.
        tile: (tz, ty, tx) tile shape.
        t_budget: static budget T of occupied tiles; overflow drops
            whole tiles in tile-id order (same class of approximation
            as the engine's site budgets — size it above real scenes).
    """
    tz, ty, tx = tile
    nz, ny, nx = grid
    gz, gy, gx = -(-nz // tz), -(-ny // ty), -(-nx // tx)
    n = coords.shape[0]
    T = t_budget

    tc = coords // jnp.asarray([tz, ty, tx], coords.dtype)
    big = np.int32(gz * gy * gx)
    assert int(gz) * gy * gx < 2 ** 31 - 1
    tlin = jnp.where(valid, tc[:, 0] * (gy * gx) + tc[:, 1] * gx
                     + tc[:, 2], big)

    iota = jax.lax.broadcasted_iota(jnp.int32, (n,), 0)
    sk, order = jax.lax.sort((tlin, iota), dimension=0, num_keys=1,
                             is_stable=True)
    head = jnp.concatenate([jnp.ones((1,), bool),
                            sk[1:] != sk[:-1]]) & (sk < big)
    ranks_sorted = jnp.cumsum(head.astype(jnp.int32)) - 1
    ranks_sorted = jnp.where(sk < big, ranks_sorted, T)

    # unique tile table (collision-free scatter-set; pad rows = big)
    tbl_idx = jnp.where(head & (ranks_sorted < T), ranks_sorted, T)
    tile_lin = jnp.full((T + 1,), big, jnp.int32).at[tbl_idx].set(
        jnp.where(head, sk, big))[:T]
    tvalid = tile_lin < big

    # back to row order
    rank = jnp.zeros((n,), jnp.int32).at[order].set(
        jnp.minimum(ranks_sorted, T))
    kept = valid & (rank < T)
    slot = ((coords[:, 0] % tz) * (ty * tx) + (coords[:, 1] % ty) * tx
            + (coords[:, 2] % tx))

    # neighbor tiles: 27 offsets around each table entry
    tzc = tile_lin // (gy * gx)
    tyc = (tile_lin // gx) % gy
    txc = tile_lin % gx
    tcoords = jnp.stack([tzc, tyc, txc], -1)              # [T, 3]
    offs = jnp.asarray(sp._kernel_offsets((3, 3, 3)) - 1, jnp.int32)
    tgt = tcoords[None] + offs[:, None]                   # [27, T, 3]
    in_b = jnp.all((tgt >= 0) & (tgt < jnp.asarray([gz, gy, gx])), -1)
    qlin = tgt[..., 0] * (gy * gx) + tgt[..., 1] * gx + tgt[..., 2]
    pos, hit, _ = sp._ranks_via_merge(tile_lin.astype(jnp.int32),
                                      jnp.where(in_b, qlin, big))
    thit = hit & in_b & tvalid[None]

    cell_mask = jnp.zeros((T + 1, tz * ty * tx), bool).at[
        jnp.where(kept, rank, T), slot].set(kept)[:T]
    return TileMap(tile_lin=tile_lin, tvalid=tvalid,
                   tnmap=jnp.where(thit, pos, 0).astype(jnp.int32),
                   thit=thit, rank=rank, slot=slot,
                   cell_mask=cell_mask.reshape(T, tz, ty, tx),
                   kept=kept, tile=(int(tz), int(ty), int(tx)))


def flatten_tile_map(tm: TileMap):
    """Batched [B, ...] TileMap (from vmap(build_tile_map)) -> one with
    flat [B*T] tile rows: tnmap offset per scene, ranks offset so
    rows_to_tiles/tiles_to_rows address the flat array. The dump rank
    for non-kept rows is B*T (one shared dump row)."""
    B, T = tm.tvalid.shape
    offs = (jnp.arange(B, dtype=jnp.int32) * T)
    tnmap = (tm.tnmap + offs[:, None, None]).transpose(1, 0, 2)\
        .reshape(27, B * T)
    thit = tm.thit.transpose(1, 0, 2).reshape(27, B * T)
    rank = jnp.where(tm.kept, tm.rank + offs[:, None], B * T)
    return TileMap(
        tile_lin=tm.tile_lin.reshape(B * T),
        tvalid=tm.tvalid.reshape(B * T),
        tnmap=tnmap, thit=thit,
        rank=rank.reshape(-1), slot=tm.slot.reshape(-1),
        cell_mask=tm.cell_mask.reshape((B * T,) + tm.cell_mask.shape[2:]),
        kept=tm.kept.reshape(-1), tile=tm.tile)


def rows_to_tiles(x, tm: TileMap):
    """[R, C] rows (flat over batch) -> [Tf, tz, ty, tx, C] dense tiles
    with exact zeros at inactive cells. Autodiff backward is a gather."""
    tz, ty, tx = tm.tile
    Tf = tm.tvalid.shape[0]
    xm = jnp.where(tm.kept[:, None], x, 0)
    tiles = jnp.zeros((Tf + 1, tz * ty * tx, x.shape[-1]), x.dtype).at[
        tm.rank, tm.slot].set(xm)[:Tf]
    return tiles.reshape(Tf, tz, ty, tx, x.shape[-1])


@jax.custom_vjp
def tiles_to_rows(tiles, rank, slot, kept):
    """[Tf, tz, ty, tx, C] -> [R, C] rows. Custom VJP: the backward is a
    collision-free scatter-SET (unique (rank, slot) per row), not the
    scatter-ADD autodiff would emit for the gather."""
    out, _ = _t2r_fwd(tiles, rank, slot, kept)
    return out


def _t2r_fwd(tiles, rank, slot, kept):
    Tf = tiles.shape[0]
    flat = tiles.reshape(Tf, -1, tiles.shape[-1])
    g = flat[jnp.minimum(rank, Tf - 1), slot]
    out = jnp.where(kept[:, None], g, 0)
    # zero-width spec array carries (Tf, tz, ty, tx) + dtype for bwd
    spec = jnp.zeros(tiles.shape[:4] + (0,), tiles.dtype)
    return out, (spec, rank, slot, kept)


def _t2r_bwd(res, dout):
    spec, rank, slot, kept = res
    Tf = spec.shape[0]
    s = int(np.prod(spec.shape[1:4]))
    dm = jnp.where(kept[:, None], dout, 0).astype(spec.dtype)
    dt = jnp.zeros((Tf + 1, s, dout.shape[-1]), spec.dtype).at[
        jnp.where(kept, rank, Tf), slot].set(dm)[:Tf]
    return (dt.reshape(spec.shape[:4] + (dout.shape[-1],)),
            None, None, None)


tiles_to_rows.defvjp(_t2r_fwd, _t2r_bwd)


def _sl(s, t):
    """Slice of a neighbor tile contributing to the halo along one dim:
    s=-1 -> its last plane, s=0 -> all of it, s=+1 -> its first plane."""
    return slice(t - 1, t) if s < 0 else (slice(0, t) if s == 0
                                          else slice(0, 1))


def _assemble_halo(tiles, tnmap, thit, tile):
    """[Tf, tz, ty, tx, C] + tile neighbor map -> [Tf, tz+2, ty+2, tx+2, C].

    Gathers only the facing slab of each of the 26 neighbors (pre-sliced
    region arrays keep gathered bytes at the 152 halo cells per tile
    instead of 27 full tiles) and stitches statically with concatenates.
    """
    tz, ty, tx = tile
    k = 0
    parts_a = []
    for a in (-1, 0, 1):
        parts_b = []
        for b in (-1, 0, 1):
            parts_c = []
            for c in (-1, 0, 1):
                if (a, b, c) == (0, 0, 0):
                    parts_c.append(tiles)
                else:
                    region = tiles[:, _sl(a, tz), _sl(b, ty), _sl(c, tx)]
                    g = region[tnmap[k]]
                    g = jnp.where(thit[k][:, None, None, None, None],
                                  g, 0)
                    parts_c.append(g)
                k += 1
            parts_b.append(jnp.concatenate(parts_c, axis=3))
        parts_a.append(jnp.concatenate(parts_b, axis=2))
    return jnp.concatenate(parts_a, axis=1)


def _dense_conv(halo, w, out_dtype):
    """halo [Tf, tz+2, ty+2, tx+2, C]; w [27, C, D] row-major over
    (z, y, x) offsets — XLA conv is cross-correlation, so the row-major
    reshape to [3, 3, 3, C, D] matches the row engine's
    gather-at-offset-k einsum exactly."""
    c, d = w.shape[1], w.shape[2]
    w5 = w.reshape(3, 3, 3, c, d).astype(halo.dtype)
    out = jax.lax.conv_general_dilated(
        halo, w5, window_strides=(1, 1, 1), padding='VALID',
        dimension_numbers=('NDHWC', 'DHWIO', 'NDHWC'),
        preferred_element_type=jnp.float32)
    return out.astype(out_dtype)


@jax.custom_vjp
def tile_subm_conv(tiles, tnmap, thit, cell_mask, weights):
    """Submanifold 3x3x3 conv in tile form.

    Args:
        tiles: [Tf, tz, ty, tx, C] with zeros at inactive cells.
        tnmap/thit: [27, Tf] flattened tile neighbor map.
        cell_mask: [Tf, tz, ty, tx] active cells.
        weights: [27, C, D] (row-major (z, y, x) offsets, same layout as
            ops.sparse.subm_conv_with_map).
    Returns:
        [Tf, tz, ty, tx, D] with zeros at inactive cells.
    """
    out, _ = _tsc_fwd(tiles, tnmap, thit, cell_mask, weights)
    return out


def _tsc_fwd(tiles, tnmap, thit, cell_mask, weights):
    tile = tiles.shape[1:4]
    halo = _assemble_halo(tiles, tnmap, thit, tile)
    out = _dense_conv(halo, weights, tiles.dtype)
    out = jnp.where(cell_mask[..., None], out, 0)
    return out, (tiles, tnmap, thit, cell_mask, weights)


def _tsc_bwd(res, dout):
    tiles, tnmap, thit, cell_mask, weights = res
    tile = tiles.shape[1:4]
    dm = jnp.where(cell_mask[..., None], dout, 0)
    # d_in: the cotangent flows through the SAME halo-exchange pattern
    # with the flipped/transposed kernel (submanifold symmetry at tile
    # granularity) — a gather+dense-conv, no scatter-adds.
    halo_d = _assemble_halo(dm, tnmap, thit, tile)
    w_t = jnp.flip(weights, axis=0).transpose(0, 2, 1)   # [27, D, C]
    din = _dense_conv(halo_d, w_t, tiles.dtype)
    # inactive input cells are structural zeros (rows_to_tiles and every
    # tile conv mask them); their cotangents are never consumed — zero
    # them so tile-form chains stay exact
    din = jnp.where(cell_mask[..., None], din, 0)
    # dW from 27 shifted views of the recomputed halo (the assemble CSEs
    # with the forward's in the same program): dW[k] = view_k^T @ dm,
    # one MXU GEMM per offset with f32 accumulation. An explicit form is
    # used instead of jax.vjp over _dense_conv because the conv
    # transpose rejects the bf16-operand/f32-cotangent mix the
    # preferred_element_type=f32 primal produces.
    halo_f = _assemble_halo(tiles, tnmap, thit, tile)
    tz, ty, tx = tile
    C = tiles.shape[-1]
    D = dm.shape[-1]
    dmf = dm.reshape(-1, D)
    dws = []
    for a in range(3):
        for b in range(3):
            for c in range(3):
                view = halo_f[:, a:a + tz, b:b + ty, c:c + tx, :]
                dws.append(jax.lax.dot_general(
                    view.reshape(-1, C), dmf, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32))
    dw = jnp.stack(dws)                                   # [27, C, D]
    return din, None, None, None, dw.astype(weights.dtype)


tile_subm_conv.defvjp(_tsc_fwd, _tsc_bwd)
