"""TPU-native sparse 3D convolution engine.

Replaces spconv / mmcv sparse ops (consumed by the reference at
/root/reference/mmdet3d/models/middle_encoders/sparse_encoder.py:12-15 and
/root/reference/mmdet3d/ops/sparse_block.py) with a static-shape
gather-GEMM-scatter formulation that XLA maps onto the TPU:

- Active voxels live in a fixed budget ``N`` per sample, kept *sorted by
  linearized coordinate* with invalid slots parked at the end. The sorted
  invariant makes neighbor lookup a vectorized binary search
  (``jnp.searchsorted``) — no hash tables, no atomics, no dynamic shapes.
- A K-point convolution is K gathers + one batched matmul
  ``einsum('knc,kcd->nd')`` that runs on the MXU.
- Regular (strided) sparse conv materializes its output active set by
  sort-deduplicating the <= K*N candidate output sites into a static
  budget.

All functions operate on a single sample; batch via ``jax.vmap``.
"""
from __future__ import annotations

import os
from typing import Tuple

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np


@flax.struct.dataclass
class SparseTensor:
    """A sample's active voxels. ``coords`` are (z, y, x), sorted by
    linearized id; rows where ``valid`` is False are padding (parked at the
    end by construction)."""
    features: jnp.ndarray                # [N, C]
    coords: jnp.ndarray                  # [N, 3] int32 (z, y, x)
    valid: jnp.ndarray                   # [N] bool
    grid: Tuple[int, int, int] = flax.struct.field(pytree_node=False)


def _linearize(coords, valid, grid):
    nz, ny, nx = grid
    big = np.int64(nz) * ny * nx
    # linear ids are int32 on TPU; the KITTI grid (41*1600*1408 ~ 9.2e7)
    # fits comfortably. Guard against silent overflow on bigger grids.
    assert big < 2 ** 31 - 1, f'grid {grid} overflows int32 linearization'
    big = np.int32(big)
    lin = (coords[:, 0].astype(jnp.int32) * (ny * nx)
           + coords[:, 1].astype(jnp.int32) * nx
           + coords[:, 2].astype(jnp.int32))
    return jnp.where(valid, lin, big), big


def from_voxels(features, coords, num_voxels, grid):
    """Build a SparseTensor from ``ops.voxelize.hard_voxelize`` outputs
    (which already emits coords sorted by linear id, invalid last)."""
    n = features.shape[0]
    idx = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)[:, 0]
    valid = idx < num_voxels
    return SparseTensor(features=features, coords=coords, valid=valid,
                        grid=tuple(grid))


def _triple(v):
    """Normalize an int or length-3 sequence to a (z, y, x) tuple."""
    return tuple(int(x) for x in np.broadcast_to(np.asarray(v), (3,)))


def _kernel_offsets(kernel_size):
    """Static [K, 3] integer offsets for a (kz, ky, kx) kernel."""
    kz, ky, kx = _triple(kernel_size)
    offs = np.stack(np.meshgrid(np.arange(kz), np.arange(ky), np.arange(kx),
                                indexing='ij'), -1).reshape(-1, 3)
    return offs  # row-major over (z, y, x)


def _ranks_via_merge(table_lin, queries):
    """Exact-match lookup of ``queries`` [K, Q] in the ascending table [T].

    TPU-tuned searchsorted replacement: one stable batched sort of
    (table ++ queries) computes every query's rank, a cummax over the
    sorted keys detects exact matches (duplicate-query safe), and a second
    sort by the carried position-iota restores the original query order.
    Sorts are cheap on TPU (~1 ms for [27, 32k]); the naive
    ``jnp.searchsorted(method='sort')`` path costs ~9 ms at the same size
    because its rank extraction is an element-rate scatter plus a scalar
    gather (measured: scatters/gathers run at ~100-200 M elem/s while
    sorts stream at multi-GB/s).

    Returns:
        (pos [K, Q] int32, hit [K, Q] bool) — ``table_lin[pos] == queries``
        exactly where ``hit``; ``pos`` is arbitrary (clipped) elsewhere.
    """
    T = table_lin.shape[0]
    K, Q = queries.shape
    keys = jnp.concatenate(
        [jnp.broadcast_to(table_lin[None, :], (K, T)),
         queries.astype(table_lin.dtype)], axis=1)
    payload = jnp.broadcast_to(
        jax.lax.broadcasted_iota(jnp.int32, (1, T + Q), 1), (K, T + Q))
    sk, sp = jax.lax.sort((keys, payload), dimension=-1, num_keys=1,
                          is_stable=True)
    is_table = sp < T
    # inclusive count of table rows at/before each sorted position; the
    # match candidate for a query is table row (rank - 1)
    rank = jnp.cumsum(is_table.astype(jnp.int32), axis=-1)
    last_tkey = jax.lax.cummax(
        jnp.where(is_table, sk, jnp.iinfo(sk.dtype).min), axis=1)
    hit_s = (~is_table) & (last_tkey == sk) & (rank > 0)
    packed = rank * 2 + hit_s.astype(jnp.int32)
    _, packed_o = jax.lax.sort((sp, packed), dimension=-1, num_keys=1)
    pq = packed_o[:, T:]
    rank_le = (pq // 2).astype(jnp.int32)   # entries <= query
    hit = (pq % 2).astype(bool)
    return jnp.maximum(rank_le - 1, 0), hit, rank_le


def _ranks_via_merge_single(table_lin, queries):
    """``_ranks_via_merge`` for K query rows sharing ONE table: instead
    of sorting [K, T + Q] (the table broadcast into every row), sort the
    single [T + K*Q] stream — 14N vs 26N key-slots for the 13-offset
    neighbor map, and the restore sort shrinks identically.

    Returns (pos [K, Q] int32, hit [K, Q] bool) with the same contract
    as ``_ranks_via_merge``'s first two results."""
    T = table_lin.shape[0]
    K, Q = queries.shape
    keys = jnp.concatenate(
        [table_lin, queries.reshape(-1).astype(table_lin.dtype)])
    payload = jax.lax.iota(jnp.int32, T + K * Q)
    sk, sp = jax.lax.sort((keys, payload), num_keys=1, is_stable=True)
    is_table = sp < T
    rank = jnp.cumsum(is_table.astype(jnp.int32))
    last_tkey = jax.lax.cummax(
        jnp.where(is_table, sk, jnp.iinfo(sk.dtype).min))
    hit_s = (~is_table) & (last_tkey == sk) & (rank > 0)
    packed = rank * 2 + hit_s.astype(jnp.int32)
    _, packed_o = jax.lax.sort((sp, packed), num_keys=1)
    pq = packed_o[T:].reshape(K, Q)
    return jnp.maximum(pq // 2 - 1, 0), (pq % 2).astype(bool)


# Single-merged-sort neighbor ranks: the 13-offset neighbor-map build
# and the compact strided build rank all their query rows against ONE
# table, so the broadcast [K, T+Q] batched sort can be a single
# [T + K*Q] stream sort. Default ON since round 5 (part of the
# scatter-ranks + merged-full-nmap + dyn-heatmap bundle measured
# 14.33 -> 14.71 scenes/s integrated); GGA_NMAP_MERGED=0 restores the
# batched sort.
NMAP_MERGED = os.environ.get('GGA_NMAP_MERGED', '1') == '1'

# Resolve all K offsets directly instead of the 13-resolve +
# mirror-scatter symmetric build: the mirror scatter is K//2 * N
# updates (~1.7M per stage at batch 8, update-rate bound) while the
# extra sorted offsets ride the cheap merged stream sort (per-stage
# builds 14.3/14.4/15.2/11.6 -> 12.6/12.2/6.9/9.8 ms). Default ON
# since round 5; GGA_NMAP_FULL=0 restores the symmetric build.
NMAP_FULL = os.environ.get('GGA_NMAP_FULL', '1') == '1'


# Windowed one-hot Pallas gather for the conv row gathers (exploits the
# sorted invariant: per offset the neighbor ranks are monotone, so each
# output block's hits live in a small aligned window — see
# ops/pallas/window_gather.py). Env-gated while being A/B'd on the full
# step (CLAUDE.md: microbench wins must be confirmed integrated).
WINDOW_GATHER = os.environ.get('GGA_WINDOW_GATHER', '0') == '1'


def _wg_ok(c):
    """The kernel needs C to divide the 128 lanes and the transposed
    output block's sublane dim (C) to be >= 8. C=128 is excluded: XLA's
    gather is byte-bound there and beats the kernel (3.3 vs 5.6 ms,
    tools/microbench_window_gather.py)."""
    from .pallas import window_gather as wg
    return 8 <= c < 128 and wg.LANES % c == 0


def _gather_t(rows, nmap, hit):
    """where(hit, rows[nmap], 0) TRANSPOSED to [K, C, Q] (the windowed
    kernel's native layout; consumers contract with 'kc' leading)."""
    from .pallas.window_gather import window_gather_t
    return window_gather_t(rows, nmap, hit)


# Neighbor ranks via a bucketed occupancy-bitmask table instead of the
# batched merge sort: one 4-byte gather per query replaces each query's
# share of a [K, 2N] sort. Buckets cover 32 consecutive linear ids;
# since table rows are sorted by lin, the bucket's first present row
# already IS the bucket's base rank — build needs two N-row scatters and
# no sort/cumsum. Gated while being A/B'd on the full step (CLAUDE.md:
# microbench wins must be confirmed integrated before landing).
NMAP_HASH = os.environ.get('GGA_NMAP_HASH', '0') == '1'
_BUCKET_BITS = 5  # 32 cells per bucket

# Split the center offset out of subm conv gathers (its map rows are
# the identity, so the center term is a plain GEMM): saves 1/27 of the
# gather rows in fwd and in the bwd dout gather. Env-gated for the
# full-step A/B (integration flips are the norm on this engine).
SUBM_CENTER_SPLIT = os.environ.get('GGA_SUBM_CENTER_SPLIT', '0') == '1'


def _bucket_table(table_lin, big):
    """(mask [NB] int32, start [NB] int32) occupancy table of the sorted
    linear-id table. mask bit (lin & 31) is set iff lin is present;
    start is the row index of the bucket's first present row (n where
    the bucket is empty — only read when a bit hits). Rows with
    lin >= big (invalid, parked last) are routed out of bounds and
    dropped by the scatters."""
    nb = (int(big) >> _BUCKET_BITS) + 1
    n = table_lin.shape[0]
    one = jnp.int32(1)
    bucket = jax.lax.shift_right_logical(table_lin, _BUCKET_BITS)
    bucket = jnp.where(table_lin >= big, jnp.int32(nb), bucket)
    bit = table_lin & 31
    iota = jax.lax.broadcasted_iota(jnp.int32, (n,), 0)
    # one [NB, 2] table so lookups pay ONE gathered row per query (the
    # gather is row-rate bound, so the 8-byte row costs the same as 4)
    init = jnp.broadcast_to(jnp.asarray([0, n], jnp.int32), (nb, 2))
    # add(-n) then min(iota): column 1 starts at n via the init and the
    # mask column's add must not disturb it, so scatter per column
    tbl = init.at[bucket, 0].add(jax.lax.shift_left(one, bit),
                                 mode='drop')
    tbl = tbl.at[bucket, 1].min(iota, mode='drop')
    return tbl


def _ranks_via_buckets(table_lin, big, queries):
    """(pos, hit) with the same contract as ``_ranks_via_merge``'s first
    two results (pos clipped/arbitrary where not hit); queries may be
    any int32 values — out-of-range ones simply miss."""
    tbl = _bucket_table(table_lin, big)
    q = queries.astype(jnp.int32)
    inb = (q >= 0) & (q < big)
    qc = jnp.where(inb, q, 0)
    b = jax.lax.shift_right_logical(qc, _BUCKET_BITS)
    bit = qc & 31
    row = tbl[b]                       # [..., 2]: (mask, start)
    m = row[..., 0]
    one = jnp.int32(1)
    hit = inb & ((jax.lax.shift_right_logical(m, bit) & one) == one)
    below = jax.lax.shift_left(one, bit) - one
    pos = row[..., 1] + jax.lax.population_count(m & below)
    n = table_lin.shape[0]
    pos = jnp.clip(pos, 0, max(n - 1, 0))
    # Materialize (pos, hit) ONCE so XLA can't refuse the lookup into
    # every consumer conv's gather fusion. Tested round 5: the barrier
    # does NOT rescue the path — full-step A/B with it reads 12.91 vs
    # 14.71 scenes/s (round 3 without it: 12.42 vs 13.76), so the
    # integrated loss is intrinsic to the bucket lookup, not a
    # recompute-fusion artifact. NMAP_HASH stays opt-in/off.
    pos, hit = jax.lax.optimization_barrier((pos, hit))
    return pos, hit


def _neighbor_pos_hit(st: SparseTensor, query_coords, query_valid,
                      kernel_size, stride, padding):
    """(pos [K, Q], hit [K, Q]) of input rows at
    ``query*stride - padding + offset`` for all kernel offsets."""
    offsets = _kernel_offsets(kernel_size)
    stride = np.asarray(_triple(stride), np.int64)
    padding = np.asarray(_triple(padding), np.int64)
    lin_in, big = _linearize(st.coords, st.valid, st.grid)
    nz, ny, nx = st.grid

    base = (query_coords.astype(jnp.int32) * stride[None, :]
            - padding[None, :])  # [Q, 3]
    tgt = base[None, :, :] + jnp.asarray(offsets, jnp.int32)[:, None, :]
    in_bounds = jnp.all(
        (tgt >= 0) & (tgt < jnp.asarray([nz, ny, nx], jnp.int32)), axis=-1)
    lin_t = (tgt[..., 0] * (ny * nx) + tgt[..., 1] * nx + tgt[..., 2])
    # out-of-bounds targets may wrap to a real row's linear id; the
    # in_bounds mask (pure vector math, no lookup) kills those hits, and
    # invalid table rows (lin == big) can't be hit by in-bounds queries
    if NMAP_HASH:
        pos, hit = _ranks_via_buckets(lin_in, big, lin_t)
    elif NMAP_MERGED:
        pos, hit = _ranks_via_merge_single(lin_in, lin_t)
    else:
        pos, hit, _ = _ranks_via_merge(lin_in, lin_t)
    hit = hit & in_bounds & query_valid[None, :]
    return pos, hit


def gather_neighbors(st: SparseTensor, query_coords, query_valid,
                     kernel_size, stride, padding):
    """Gather input features at ``query*stride - padding + offset`` for all
    kernel offsets.

    Returns:
        [K, Q, C] features (zeros where the neighbor is inactive).
    """
    pos, hit = _neighbor_pos_hit(st, query_coords, query_valid,
                                 kernel_size, stride, padding)
    feats = jnp.where(hit.reshape(-1)[:, None], st.features[pos.reshape(-1)],
                      0.0)
    K = pos.shape[0]
    return feats.reshape(K, query_coords.shape[0], st.features.shape[-1])


def subm_conv(st: SparseTensor, weights, bias=None):
    """Submanifold sparse conv: output sites == input sites
    (spconv SubMConv3d semantics; padding fixed at (k-1)/2).

    Args:
        st: input sparse tensor.
        weights: [K, Cin, Cout] with K = prod(kernel_size); kernel offsets
            row-major over (z, y, x).

    Returns:
        SparseTensor with the same coords/valid and new features.
    """
    K = weights.shape[0]
    k = round(K ** (1 / 3))
    assert k ** 3 == K, 'subm_conv expects a cubic kernel'
    pad = (k - 1) // 2
    gathered = gather_neighbors(st, st.coords, st.valid,
                                (k, k, k), (1, 1, 1), (pad, pad, pad))
    out = jnp.einsum('knc,kcd->nd', gathered,
                     weights.astype(gathered.dtype),
                     preferred_element_type=jnp.float32)
    if bias is not None:
        out = out + bias
    out = jnp.where(st.valid[:, None], out, 0.0)
    return st.replace(features=out.astype(st.features.dtype))


def downsample_coords(st: SparseTensor, kernel_size, stride, padding,
                      out_budget):
    """Active output sites of a strided sparse conv, sort-deduplicated into
    a static budget (spconv SparseConv3d output-site semantics: every
    position whose kernel window touches an active input).

    Returns:
        (out_coords [M, 3], out_valid [M], out_grid) with M = out_budget,
        sorted by linear id.
    """
    ksz = _triple(kernel_size)
    stride_a = np.asarray(_triple(stride), np.int64)
    pad_a = np.asarray(_triple(padding), np.int64)
    nz, ny, nx = st.grid
    out_grid = tuple(
        int((d + 2 * p - k) // s + 1)
        for d, p, k, s in zip((nz, ny, nx), pad_a, ksz, stride_a))
    oz, oy, ox = out_grid

    # Candidate outputs per input, enumerated per dim as
    # o_d = floor((c + p) / s) - d for d in [0, ceil(k/s)): only these can
    # satisfy o*s - p + off == c with off in [0, k). This is ceil(k/s)^3
    # candidates (8 for k3 s2, 1 for k2 s2) instead of the naive K=prod(k)
    # (27), shrinking the dedupe sort by ~3-8x.
    n_cand = [int(-(-k // s)) for k, s in zip(ksz, stride_a)]
    ds = np.stack(np.meshgrid(*[np.arange(c) for c in n_cand],
                              indexing='ij'), -1).reshape(-1, 3)  # [D, 3]
    cp = st.coords.astype(jnp.int32) + jnp.asarray(pad_a, jnp.int32)
    base_o = cp // jnp.asarray(stride_a, jnp.int32)          # [N, 3]
    o = base_o[None, :, :] - jnp.asarray(ds, jnp.int32)[:, None, :]
    # coverage: 0 <= c + p - o*s <= k-1
    off = cp[None, :, :] - o * jnp.asarray(stride_a, jnp.int32)
    cover = jnp.all((off >= 0) & (off < jnp.asarray(ksz, jnp.int32)),
                    axis=-1)
    in_rng = jnp.all(
        (o >= 0) & (o < jnp.asarray(out_grid, jnp.int32)), axis=-1)
    ok = cover & in_rng & st.valid[None, :]

    big = np.int64(oz) * oy * ox
    lin = (o[..., 0] * (oy * ox) + o[..., 1] * ox + o[..., 2]).reshape(-1)
    lin = jnp.where(ok.reshape(-1), lin, big)
    lin_s = jnp.sort(lin)
    prev = jnp.concatenate([jnp.full((1,), -1, lin_s.dtype), lin_s[:-1]])
    newv = (lin_s != prev) & (lin_s < big)
    if BUDGET_PRIORITY == 'dist':
        newv = newv & _budget_keep(lin_s, newv, jnp.int32(big), out_grid,
                                   out_budget)
    slot = jnp.cumsum(newv.astype(jnp.int32)) - 1
    slot = jnp.where(newv & (slot < out_budget), slot, out_budget)

    out_lin = jnp.full((out_budget + 1,), big, jnp.int32).at[slot].set(
        jnp.where(newv, lin_s, big))[:out_budget]
    out_valid = out_lin < big
    zz = out_lin // (oy * ox)
    yy = (out_lin % (oy * ox)) // ox
    xx = out_lin % ox
    out_coords = jnp.where(
        out_valid[:, None],
        jnp.stack([zz, yy, xx], -1).astype(jnp.int32), -1)
    return out_coords, out_valid, out_grid


def sparse_conv(st: SparseTensor, weights, kernel_size, stride, padding,
                out_budget, bias=None):
    """Regular (strided) sparse conv with static output budget.

    Args:
        weights: [K, Cin, Cout], K = prod(kernel_size).
        kernel_size / stride / padding: 3-tuples (z, y, x).

    Returns:
        SparseTensor on the downsampled grid.
    """
    out_coords, out_valid, out_grid = downsample_coords(
        st, kernel_size, stride, padding, out_budget)
    gathered = gather_neighbors(st, out_coords, out_valid, kernel_size,
                                stride, padding)
    out = jnp.einsum('knc,kcd->nd', gathered,
                     weights.astype(gathered.dtype),
                     preferred_element_type=jnp.float32)
    if bias is not None:
        out = out + bias
    out = jnp.where(out_valid[:, None], out, 0.0)
    return SparseTensor(features=out.astype(st.features.dtype),
                        coords=out_coords, valid=out_valid, grid=out_grid)


def to_dense(st: SparseTensor):
    """Scatter into a dense [C, nz, ny, nx] grid (SparseConvTensor.dense)."""
    nz, ny, nx = st.grid
    z = jnp.where(st.valid, st.coords[:, 0], nz)
    y = jnp.where(st.valid, st.coords[:, 1], 0)
    x = jnp.where(st.valid, st.coords[:, 2], 0)
    dense = jnp.zeros((nz + 1, ny, nx, st.features.shape[-1]),
                      st.features.dtype)
    dense = dense.at[z, y, x].set(
        jnp.where(st.valid[:, None], st.features, 0.0))
    return dense[:nz].transpose(3, 0, 1, 2)


def sparse_max_pool(st: SparseTensor, kernel_size=(2, 2, 2),
                    stride=(2, 2, 2), out_budget=None):
    """Max pooling over sparse neighborhoods (MinkowskiMaxPooling
    equivalent, consumed by MinkResNet — mink_resnet.py:56)."""
    if out_budget is None:
        out_budget = st.features.shape[0]
    out_coords, out_valid, out_grid = downsample_coords(
        st, kernel_size, stride, (0, 0, 0), out_budget)
    gathered = gather_neighbors(
        SparseTensor(st.features, st.coords, st.valid, st.grid),
        out_coords, out_valid, kernel_size, stride, (0, 0, 0))  # [K, Q, C]
    neg = jnp.finfo(st.features.dtype).min
    # inactive neighbors gathered as exact 0; mask via a parallel gather of
    # ones to distinguish true zeros from misses
    ones = SparseTensor(jnp.ones_like(st.features[:, :1]), st.coords,
                        st.valid, st.grid)
    hit = gather_neighbors(ones, out_coords, out_valid, kernel_size,
                           stride, (0, 0, 0))[..., 0] > 0
    g = jnp.where(hit[..., None], gathered, neg)
    out = g.max(axis=0)
    out = jnp.where(hit.any(axis=0)[:, None] & out_valid[:, None], out, 0.0)
    return SparseTensor(features=out, coords=out_coords, valid=out_valid,
                        grid=out_grid)


def generative_transpose_conv(st: SparseTensor, weights, out_budget=None):
    """Generative transposed conv, kernel 2 stride 2
    (MinkowskiGenerativeConvolutionTranspose in FCAF3D's up blocks,
    fcaf3d_head.py:96-113): every input site generates its 8 children on
    the doubled grid; children of distinct inputs never collide
    (kernel == stride), so out[c*2 + off] = in[c] @ W[off].

    Args:
        weights: [8, Cin, Cout] (offset order row-major over (z, y, x)).

    Returns:
        SparseTensor on the doubled grid, sorted, budget = 8N (or given).
    """
    N, Cin = st.features.shape
    Cout = weights.shape[-1]
    if out_budget is None:
        out_budget = 8 * N
    nz, ny, nx = st.grid
    out_grid = (nz * 2, ny * 2, nx * 2)
    offs = _kernel_offsets((2, 2, 2))  # [8, 3]

    child_coords = (st.coords[None, :, :] * 2
                    + jnp.asarray(offs, jnp.int32)[:, None, :])  # [8, N, 3]
    child_feats = jnp.einsum('nc,kcd->knd', st.features, weights,
                             preferred_element_type=jnp.float32)
    child_valid = jnp.broadcast_to(st.valid[None, :], (8, N))

    cc = child_coords.reshape(-1, 3)
    cf = child_feats.reshape(-1, Cout).astype(st.features.dtype)
    cv = child_valid.reshape(-1)
    # sort by linear id to restore the invariant
    lin, big = _linearize(cc, cv, out_grid)
    order = jnp.argsort(lin)
    cc, cf, cv = cc[order], cf[order], cv[order]
    if out_budget < 8 * N:
        cc, cf, cv = cc[:out_budget], cf[:out_budget], cv[:out_budget]
    elif out_budget > 8 * N:
        pad = out_budget - 8 * N
        cc = jnp.concatenate([cc, -jnp.ones((pad, 3), cc.dtype)])
        cf = jnp.concatenate([cf, jnp.zeros((pad, Cout), cf.dtype)])
        cv = jnp.concatenate([cv, jnp.zeros((pad,), bool)])
    cc = jnp.where(cv[:, None], cc, -1)
    return SparseTensor(features=cf, coords=cc, valid=cv, grid=out_grid)


def sparse_add(a: SparseTensor, b: SparseTensor, out_budget):
    """Union-merge two sparse tensors on the same grid, summing features at
    shared sites (MinkowskiEngine ``a + b`` semantics in FCAF3D's top-down
    pathway, fcaf3d_head.py:166)."""
    assert a.grid == b.grid
    C = a.features.shape[-1]
    coords = jnp.concatenate([a.coords, b.coords])
    feats = jnp.concatenate([a.features, b.features])
    valid = jnp.concatenate([a.valid, b.valid])
    lin, big = _linearize(coords, valid, a.grid)
    order = jnp.argsort(lin)
    lin_s, feats_s, coords_s, valid_s = (lin[order], feats[order],
                                         coords[order], valid[order])
    prev = jnp.concatenate([jnp.full((1,), -1, lin_s.dtype), lin_s[:-1]])
    newv = (lin_s != prev) & valid_s
    slot = jnp.cumsum(newv.astype(jnp.int32)) - 1
    slot = jnp.where(valid_s & (slot < out_budget), slot, out_budget)
    out_f = jnp.zeros((out_budget + 1, C), feats.dtype).at[slot].add(
        jnp.where(valid_s[:, None], feats_s, 0.0))
    out_c = jnp.full((out_budget + 1, 3), -1, jnp.int32).at[slot].set(
        coords_s)
    out_v = jnp.zeros((out_budget + 1,), bool).at[slot].set(valid_s)
    return SparseTensor(features=out_f[:out_budget],
                        coords=out_c[:out_budget],
                        valid=out_v[:out_budget], grid=a.grid)


def lookup_features(st: SparseTensor, query_coords, query_valid):
    """Gather features at exact coordinates ([Q, C]; zeros on miss).
    Nearest-site stand-in for ME's features_at_coordinates used by FCAF3D
    pruning (fcaf3d_head.py:225)."""
    g = gather_neighbors(st, query_coords, query_valid, (1, 1, 1),
                         (1, 1, 1), (0, 0, 0))
    return g[0]


def topk_prune(st: SparseTensor, scores, k_budget):
    """Keep the k_budget highest-scoring active sites (MinkowskiPruning +
    per-sample topk, fcaf3d_head.py:212-236), re-sorted by coordinate."""
    s = jnp.where(st.valid, scores, -jnp.inf)
    _, idx = jax.lax.top_k(s, min(k_budget, s.shape[0]))
    keep_valid = jnp.isfinite(jnp.take(s, idx))
    coords = st.coords[idx]
    feats = st.features[idx]
    lin, big = _linearize(coords, keep_valid, st.grid)
    order = jnp.argsort(lin)
    return SparseTensor(features=feats[order], coords=coords[order],
                        valid=keep_valid[order], grid=st.grid)


def build_neighbor_map(st: SparseTensor, kernel_size=(3, 3, 3)):
    """Precompute the gather map for a submanifold conv on this active set.

    SubM convs within a stage share the same coordinates, so the
    neighbor resolution only needs to run once per stage instead of once
    per conv layer. Only the FIRST (K-1)/2 kernel offsets are resolved
    by sort (_ranks_via_merge); the center offset is the identity map
    and the mirrored half follows from the submanifold symmetry
    (pos[k][n] = m  <=>  pos[K-1-k][m] = n) via one collision-free
    scatter — halving the dominant [K, 2N] sorts.

    Returns:
        (pos [K, N] int32 gather rows, hit [K, N] bool).
    """
    k = _triple(kernel_size)
    pad = tuple((x - 1) // 2 for x in k)
    K = int(np.prod(k))
    if K % 2 == 0 or NMAP_HASH or NMAP_FULL:
        # bucket-table lookups cost one gather per (offset, row) — the
        # half-resolve + mirror-scatter trick only pays when sorts
        # dominate, so resolve all offsets directly
        return _neighbor_pos_hit(st, st.coords, st.valid, k, (1, 1, 1),
                                 pad)
    H = K // 2
    offsets = _kernel_offsets(k)
    stride_a = np.ones(3, np.int64)
    pad_a = np.asarray(pad, np.int64)
    nz, ny, nx = st.grid
    lin_in, big = _linearize(st.coords, st.valid, st.grid)

    base = st.coords.astype(jnp.int32) - jnp.asarray(pad_a, jnp.int32)
    tgt = base[None, :, :] + jnp.asarray(offsets[:H], jnp.int32)[:, None]
    in_bounds = jnp.all(
        (tgt >= 0) & (tgt < jnp.asarray([nz, ny, nx], jnp.int32)),
        axis=-1)
    lin_t = (tgt[..., 0] * (ny * nx) + tgt[..., 1] * nx + tgt[..., 2])
    if NMAP_MERGED:
        pos_h, hit_h = _ranks_via_merge_single(lin_in, lin_t)  # [H, N]
    else:
        pos_h, hit_h, _ = _ranks_via_merge(lin_in, lin_t)      # [H, N]
    hit_h = hit_h & in_bounds & st.valid[None, :]

    N = st.coords.shape[0]
    iota = jax.lax.broadcasted_iota(jnp.int32, (H, N), 1)
    # invert each of the H resolved offsets: partner pairs are unique,
    # so the scatter is collision-free; misses park in the dump row N
    idx = jnp.where(hit_h, pos_h, N)
    packed = jnp.full((H, N + 1), 0, jnp.int32).at[
        jnp.arange(H)[:, None], idx].set(iota * 2 + 1)[:, :N]
    pos_m = packed >> 1
    hit_m = (packed & 1).astype(bool)
    # mirrored offsets come in REVERSE offset order (K-1-k for k=0..H-1)
    pos_m = jnp.flip(pos_m, axis=0)
    hit_m = jnp.flip(hit_m, axis=0)

    pos_c = jax.lax.broadcasted_iota(jnp.int32, (1, N), 1)  # center
    hit_c = st.valid[None, :]
    pos = jnp.concatenate([pos_h, pos_c, pos_m], axis=0)
    hit = jnp.concatenate([hit_h, hit_c, hit_m], axis=0)
    return pos, hit


@jax.custom_vjp
def subm_conv_with_map(features, valid, nmap, hit, weights):
    """Submanifold conv using a precomputed neighbor map.

    Custom VJP: the backward w.r.t. features uses the MIRRORED neighbor
    map (the submanifold relation is symmetric: m sits at offset k from n
    iff n sits at offset K-1-k from m), so it is a gather+GEMM like the
    forward — avoiding TPU scatter-adds, which are scalar-rate bound and
    dominate the naive autodiff backward.

    Args:
        features: [N, Cin]; valid: [N]; nmap/hit: from build_neighbor_map.
        weights: [K, Cin, Cout].
    """
    out, _ = _subm_fwd(features, valid, nmap, hit, weights)
    return out


def _subm_fwd(features, valid, nmap, hit, weights):
    if WINDOW_GATHER and _wg_ok(features.shape[-1]):
        g_t = _gather_t(features, nmap, hit)             # [K, Cin, N]
        out = jnp.einsum('kcn,kcd->nd', g_t,
                         weights.astype(features.dtype),
                         preferred_element_type=jnp.float32)
    elif SUBM_CENTER_SPLIT and nmap.shape[0] % 2 == 1:
        # the center offset's map rows are the identity (nmap[c] = iota
        # where hit — build_neighbor_map resolves a row's own lin id to
        # its own rank; flatten_nmap's per-scene offsets preserve it),
        # so its gather is a free GEMM: drop 1 of K gathered row-sets
        c = nmap.shape[0] // 2
        nc = jnp.concatenate([nmap[:c], nmap[c + 1:]])
        hc = jnp.concatenate([hit[:c], hit[c + 1:]])
        wc = jnp.concatenate([weights[:c], weights[c + 1:]])
        gathered = jnp.where(hc[..., None], features[nc],
                             jnp.zeros((), features.dtype))
        fc = jnp.where(hit[c][:, None], features,
                       jnp.zeros((), features.dtype))
        out = (jnp.einsum('knc,kcd->nd', gathered,
                          wc.astype(features.dtype),
                          preferred_element_type=jnp.float32)
               + jnp.einsum('nc,cd->nd', fc,
                            weights[c].astype(features.dtype),
                            preferred_element_type=jnp.float32))
    else:
        gathered = jnp.where(hit[..., None], features[nmap],
                             jnp.zeros((), features.dtype))  # [K, N, Cin]
        out = jnp.einsum('knc,kcd->nd', gathered,
                         weights.astype(features.dtype),
                         preferred_element_type=jnp.float32)
    out = jnp.where(valid[:, None], out, 0.0).astype(features.dtype)
    return out, (features, valid, nmap, hit, weights)


def _subm_bwd(res, dout):
    features, valid, nmap, hit, weights = res
    dout = jnp.where(valid[:, None], dout, 0.0)
    w_t = jnp.flip(weights, axis=0).transpose(0, 2, 1)     # [K, Cout, Cin]
    if (WINDOW_GATHER and _wg_ok(features.shape[-1])
            and _wg_ok(dout.shape[-1])):
        # same kernel both ways: dout's gather uses the SAME (monotone)
        # map; the features re-gather CSEs with the forward's call
        g_tf = _gather_t(features, nmap, hit)
        dw = jnp.einsum('kcn,nd->kcd', g_tf, dout,
                        preferred_element_type=jnp.float32).astype(
                            weights.dtype)
        g_td = _gather_t(dout, nmap, hit)                  # [K, Cout, N]
        df = jnp.einsum('kdn,kdc->nc', g_td,
                        w_t.astype(dout.dtype),
                        preferred_element_type=jnp.float32).astype(
                            features.dtype)
        df = jnp.where(valid[:, None], df, 0.0)
        return df, None, None, None, dw
    if SUBM_CENTER_SPLIT and nmap.shape[0] % 2 == 1:
        # mirror of the center offset is the center itself, so the
        # center terms of dW and dF are plain GEMMs; the 26-offset
        # re-gathers CSE with the forward's (same split form)
        c = nmap.shape[0] // 2
        nc = jnp.concatenate([nmap[:c], nmap[c + 1:]])
        hc = jnp.concatenate([hit[:c], hit[c + 1:]])
        wc = jnp.concatenate([weights[:c], weights[c + 1:]])
        gathered_f = jnp.where(hc[..., None], features[nc],
                               jnp.zeros((), features.dtype))
        fc = jnp.where(hit[c][:, None], features,
                       jnp.zeros((), features.dtype))
        dw26 = jnp.einsum('knc,nd->kcd', gathered_f, dout,
                          preferred_element_type=jnp.float32)
        dw_c = jnp.einsum('nc,nd->cd', fc, dout,
                          preferred_element_type=jnp.float32)
        dw = jnp.concatenate([dw26[:c], dw_c[None], dw26[c:]],
                             axis=0).astype(weights.dtype)
        gathered_d = jnp.where(hc[..., None], dout[nc],
                               jnp.zeros((), dout.dtype))
        w26_t = jnp.flip(wc, axis=0).transpose(0, 2, 1)
        df = (jnp.einsum('knd,kdc->nc', gathered_d,
                         w26_t.astype(dout.dtype),
                         preferred_element_type=jnp.float32)
              + jnp.einsum('nd,dc->nc', dout,
                           weights[c].transpose().astype(dout.dtype),
                           preferred_element_type=jnp.float32))
        df = jnp.where(valid[:, None], df, 0.0).astype(features.dtype)
        return df, None, None, None, dw
    # dW[k] = gathered_f[k]^T @ dout. The features re-gather is FREE:
    # XLA CSEs it with the forward's identical gather in the same
    # program (measured: replacing it with a mirrored-pair einsum on
    # gathered_d gave 14.1 vs 14.4 scenes/s — keep the CSE form).
    gathered_f = jnp.where(hit[..., None], features[nmap],
                           jnp.zeros((), features.dtype))
    dw = jnp.einsum('knc,nd->kcd', gathered_f, dout,
                    preferred_element_type=jnp.float32).astype(
                        weights.dtype)
    # df[m] = sum_k hit[k, m] * W[K-1-k] @ dout[nmap[k, m]] — the SAME
    # map rows, paired with the MIRRORED kernel weights (offset symmetry:
    # nmap[k, n] = m  <=>  nmap[K-1-k, m] = n)
    gathered_d = jnp.where(hit[..., None], dout[nmap],
                           jnp.zeros((), dout.dtype))      # [K, N, Cout]
    df = jnp.einsum('knd,kdc->nc', gathered_d,
                    w_t.astype(dout.dtype),
                    preferred_element_type=jnp.float32).astype(
                        features.dtype)
    df = jnp.where(valid[:, None], df, 0.0)
    return df, None, None, None, dw


subm_conv_with_map.defvjp(_subm_fwd, _subm_bwd)


# Fully fused windowed subm conv: gather + per-offset GEMM + K-offset
# accumulation in ONE Pallas kernel — the [K, C, B*N] gathered
# intermediate never exists in HBM. Opt-in via GGA_WINDOW_CONV=1
# (requires the window-gather preconditions; falls back to the einsum
# path per-call on span overflow).
WINDOW_CONV = os.environ.get('GGA_WINDOW_CONV', '0') == '1'

# Per-stage A/B cap: GGA_WINDOW_CONV_CMAX=32 enables the fused kernel
# only for C<=32 convs (encoder stages 0-1, isolated fwd+bwd win
# 1.44-1.71x) while C=64 (stage2, ~parity isolated) stays on the einsum
# path.
WINDOW_CONV_CMAX = int(os.environ.get('GGA_WINDOW_CONV_CMAX', '127'))


def _wc_ok(c):
    """Channel gate for the fused window conv: window-gather
    preconditions plus the per-stage A/B cap."""
    return _wg_ok(c) and c <= WINDOW_CONV_CMAX


def _window_conv_apply(features, nmap, hit, weights):
    """cond(overflow, einsum path, fused kernel): [Q, D]."""
    from .pallas import window_gather as wg
    k, q = nmap.shape
    c = features.shape[-1]
    d = weights.shape[-1]
    pack = wg.LANES // c
    window = wg._wg_for(c) * pack
    qp = (-q) % wg.TILE
    nmap_p = jnp.pad(nmap, ((0, 0), (0, qp)))
    hit_p = jnp.pad(hit, ((0, 0), (0, qp)))
    f = wg._pad_rows(features, 2 * window)
    fwide = f.reshape(f.shape[0] // pack, wg.LANES)
    bb, cols, ovf = wg.window_prep(nmap_p, hit_p, f.shape[0], c)
    w_cast = weights.astype(features.dtype)

    def xla_path(_):
        g = jnp.where(hit.reshape(-1)[:, None],
                      features[jnp.maximum(nmap, 0).reshape(-1)], 0.0)
        g = g.reshape(k, q, c)
        return jnp.einsum('knc,kcd->nd', g, w_cast,
                          preferred_element_type=jnp.float32).astype(
                              features.dtype)

    def pallas_path(_):
        interp = jax.default_backend() != 'tpu'
        out = wg._window_conv(fwide, c, d, bb, cols, w_cast,
                              interpret=interp)
        return out[:q]

    return jax.lax.cond(ovf, xla_path, pallas_path, None)


def _window_dw_apply(features, nmap, hit, dout):
    """cond(overflow, einsum path, fused dW kernel): [K, C, D] f32."""
    from .pallas import window_gather as wg
    k, q = nmap.shape
    c = features.shape[-1]
    d = dout.shape[-1]
    pack = wg.LANES // c
    window = wg._wg_for(c) * pack
    qp = (-q) % (wg.GROUP * wg.TILE)
    nmap_p = jnp.pad(nmap, ((0, 0), (0, qp)))
    hit_p = jnp.pad(hit, ((0, 0), (0, qp)))
    f = wg._pad_rows(features, 2 * window)
    fwide = f.reshape(f.shape[0] // pack, wg.LANES)
    bb, cols, ovf = wg.window_prep(nmap_p, hit_p, f.shape[0], c)
    dout_p = jnp.pad(dout, ((0, qp), (0, 0)))

    def xla_path(_):
        g = jnp.where(hit.reshape(-1)[:, None],
                      features[jnp.maximum(nmap, 0).reshape(-1)], 0.0)
        g = g.reshape(k, q, c)
        return jnp.einsum('knc,nd->kcd', g, dout,
                          preferred_element_type=jnp.float32)

    def pallas_path(_):
        interp = jax.default_backend() != 'tpu'
        return wg._window_dw(fwide, c, d, bb, cols, dout_p,
                             interpret=interp)

    return jax.lax.cond(ovf, xla_path, pallas_path, None)


@jax.custom_vjp
def subm_conv_window(features, valid, nmap, hit, weights):
    """``subm_conv_with_map`` on the fused windowed kernel (same args,
    same semantics; summation order differs so expect f32-accumulation
    noise, not bitwise equality)."""
    out, _ = _subm_window_fwd(features, valid, nmap, hit, weights)
    return out


def _subm_window_fwd(features, valid, nmap, hit, weights):
    out = _window_conv_apply(features, nmap, hit, weights)
    out = jnp.where(valid[:, None], out, 0.0).astype(features.dtype)
    return out, (features, valid, nmap, hit, weights)


def _subm_window_bwd(res, dout):
    features, valid, nmap, hit, weights = res
    dout = jnp.where(valid[:, None], dout, 0.0).astype(features.dtype)
    dw = _window_dw_apply(features, nmap, hit, dout).astype(weights.dtype)
    # df via offset symmetry: same maps, weights flipped + transposed
    w_t = jnp.flip(weights, axis=0).transpose(0, 2, 1)
    df = _window_conv_apply(dout, nmap, hit, w_t)
    df = jnp.where(valid[:, None], df, 0.0).astype(features.dtype)
    return df, None, None, None, dw


subm_conv_window.defvjp(_subm_window_fwd, _subm_window_bwd)


def _ds_prep(grid, kernel_size, stride, padding, n):
    """Host-side constants of a strided-conv rulebook: kernel triple,
    stride/pad arrays, output grid, feasible candidate offsets [D, 3],
    int32 overflow guards."""
    ksz = _triple(kernel_size)
    stride_a = np.asarray(_triple(stride), np.int64)
    pad_a = np.asarray(_triple(padding), np.int64)
    nz, ny, nx = grid
    out_grid = tuple(
        int((d + 2 * p - k) // s + 1)
        for d, p, k, s in zip((nz, ny, nx), pad_a, ksz, stride_a))
    K = int(np.prod(ksz))
    n_cand = [int(-(-k // s)) for k, s in zip(ksz, stride_a)]
    ds = np.stack(np.meshgrid(*[np.arange(c) for c in n_cand],
                              indexing='ij'), -1).reshape(-1, 3)  # [D, 3]
    big = np.int64(out_grid[0]) * out_grid[1] * out_grid[2]
    assert big < 2 ** 31 - 1, f'out grid {out_grid} overflows int32'
    assert n * K < 2 ** 31 - 1
    return ksz, stride_a, pad_a, out_grid, ds, np.int32(big), K


def _ds_pairs(coords, valid, ksz, stride_a, pad_a, out_grid, ds, big, K,
              carry_d=False):
    """Per-scene (input, output-candidate) pair stream of a strided conv,
    sorted by output linear id: enumerates the <= D feasible candidates
    per input, sorts the D*N pairs, and derives the dedupe stream.

    Returns (keys [D*N] sorted out-lin ids with ``big`` for infeasible,
    pay [D*N] = input_row * K + offset_id, newv [D*N] first-pair-of-output
    flags, slot [D*N] output rank per pair, pair_ok [D*N],
    lin [D, N] PRE-sort candidate out-lin ids (``big`` where
    infeasible) for rank-by-merge consumers). With ``carry_d`` the
    payload additionally carries the candidate index d PACKED into the
    low bits (pay2 = (i*K + k)*D + d — a 3-operand variadic sort loses
    the fast 2-operand key/payload lowering) and a trailing d_s [D*N]
    (candidate index per sorted pair) is appended — consumers that
    scatter into [D, N] layouts (compact bwd_d, pair-major conv) need
    it and recomputing it post-sort would cost a row gather."""
    oz, oy, ox = out_grid
    cp = coords.astype(jnp.int32) + jnp.asarray(pad_a, jnp.int32)
    base_o = cp // jnp.asarray(stride_a, jnp.int32)          # [N, 3]
    o = base_o[None, :, :] - jnp.asarray(ds, jnp.int32)[:, None, :]
    off = cp[None, :, :] - o * jnp.asarray(stride_a, jnp.int32)
    cover = jnp.all((off >= 0) & (off < jnp.asarray(ksz, jnp.int32)),
                    axis=-1)
    in_rng = jnp.all(
        (o >= 0) & (o < jnp.asarray(out_grid, jnp.int32)), axis=-1)
    ok = cover & in_rng & valid[None, :]

    k_id = (off[..., 0] * (ksz[1] * ksz[2]) + off[..., 1] * ksz[2]
            + off[..., 2])                                   # [D, N]
    i_idx = jax.lax.broadcasted_iota(jnp.int32, k_id.shape, 1)
    payload = i_idx * K + k_id
    lin = (o[..., 0] * (oy * ox) + o[..., 1] * ox + o[..., 2])
    lin = jnp.where(ok, lin, big)
    if carry_d:
        D = ds.shape[0]
        assert np.int64(k_id.shape[1]) * K * D < 2 ** 31 - 1
        d_iota = jax.lax.broadcasted_iota(jnp.int32, k_id.shape, 0)
        pay2 = payload * D + d_iota
        keys, pay2 = jax.lax.sort(
            (lin.reshape(-1), pay2.reshape(-1)), num_keys=1)
        pay = pay2 // D
        d_s = pay2 % D
    else:
        keys, pay = jax.lax.sort((lin.reshape(-1), payload.reshape(-1)),
                                 num_keys=1)
    prev = jnp.concatenate([jnp.full((1,), -1, keys.dtype), keys[:-1]])
    pair_ok = keys < big
    newv = (keys != prev) & pair_ok
    slot = jnp.cumsum(newv.astype(jnp.int32)) - 1            # per pair
    if carry_d:
        return keys, pay, newv, slot, pair_ok, lin, d_s
    return keys, pay, newv, slot, pair_ok, lin


# Budget-overflow truncation priority. 'coord' (historical) drops
# overflow sites in linearized-coordinate order — spatially biased
# toward the grid corner. 'dist' (default) keeps the sites NEAREST THE
# EGO (voxel-grid BEV distance; x forward from 0, y centered), dropping
# the far tail instead — the reference never truncates here at all
# (dynamic spconv shapes), so when the budget saturates the near field
# is what fidelity wants. Selection threshold comes from one extra
# two-key sort of the per-site (d2, lin) priorities; slots among kept
# sites stay assigned in lin order, preserving the sorted invariant.
BUDGET_PRIORITY = os.environ.get('GGA_BUDGET_PRIORITY', 'dist')


def _budget_keep(keys, newv, big, out_grid, budget):
    """Per-pair keep mask for distance-priority budget truncation.

    Args:
        keys: [L] pair out-lin ids, sorted ascending (``big`` = invalid).
        newv: [L] first-pair-of-site flags.
        big: invalid sentinel (= prod(out_grid)).
        out_grid: (oz, oy, ox).
        budget: static site budget M.

    Returns:
        keep [L] bool: pair's site is within the budget by (d2, lin)
        priority. Exactly min(n_sites, budget) sites survive (the
        (d2, lin) composite is unique per site).
    """
    oz, oy, ox = out_grid
    rem = keys % (oy * ox)
    y = rem // ox
    x = rem % ox
    d2 = x * x + (y - oy // 2) ** 2
    imax = jnp.iinfo(jnp.int32).max
    d2 = jnp.where(keys < big, d2, imax)
    site_d2 = jnp.where(newv, d2, imax)
    site_lin = jnp.where(newv, keys, imax)
    sd2, slin = jax.lax.sort((site_d2, site_lin), num_keys=2)
    i = min(budget, keys.shape[0]) - 1
    td2, tlin = sd2[i], slin[i]
    return (keys < big) & ((d2 < td2) | ((d2 == td2) & (keys <= tlin)))


def downsample_rulebook_batched(coords, valid, grid, kernel_size, stride,
                                padding, out_budget):
    """Batched ``downsample_rulebook`` emitting BATCH-FLAT gather maps
    directly (the ``flatten_rulebook`` layout modules consume).

    The candidate enumeration + pair sort stay vmapped (batched sorts
    lower fine), but the three ~D*N-update scatters that build the output
    table and the fwd/bwd maps run FLAT over [B * D * N] updates into
    flat targets — vmapped scatters, like vmapped gathers
    (tools/microbench_vmap_gather.py), lower several times slower on TPU
    than the same updates against a flat operand, and at batch 8 those
    scatters dominate the strided conv itself
    (tools/microbench_rulebook.py --b 8).

    Args:
        coords: [B, N, 3] int32, each scene sorted by linear id.
        valid: [B, N] bool.
    Returns:
        (out_coords [B, M, 3], out_valid [B, M], out_grid,
         fwd_flat [K, B*M] int32 row map into [B*N] inputs,
         bwd_flat [K, B*N] int32 row map into [B*M] outputs).
    """
    B, N = valid.shape
    M = out_budget
    ksz, stride_a, pad_a, out_grid, ds, big, K = _ds_prep(
        grid, kernel_size, stride, padding, N)
    keys, pay, newv, slot, pair_ok, _ = jax.vmap(
        lambda c, v: _ds_pairs(c, v, ksz, stride_a, pad_a, out_grid, ds,
                               big, K))(coords, valid)       # each [B, D*N]
    if BUDGET_PRIORITY == 'dist':
        keep = jax.vmap(lambda k, nv: _budget_keep(
            k, nv, big, out_grid, M))(keys, newv)
        newv = newv & keep
        slot = jnp.cumsum(newv.astype(jnp.int32), axis=-1) - 1
        pair_ok = pair_ok & keep
    slot_ok = pair_ok & (slot >= 0) & (slot < M)
    b_ix = jax.lax.broadcasted_iota(jnp.int32, keys.shape, 0)

    assert np.int64(K) * B * max(M, N) < 2 ** 31 - 1
    k_arr = pay % K
    i_arr = pay // K
    fidx = jnp.where(slot_ok, k_arr * (B * M) + b_ix * M + slot,
                     K * B * M).reshape(-1)
    fwd_flat = jnp.full((K * B * M + 1,), -1, jnp.int32).at[fidx].set(
        (b_ix * N + i_arr).reshape(-1))[:K * B * M].reshape(K, B * M)
    bidx = jnp.where(slot_ok, k_arr * (B * N) + b_ix * N + i_arr,
                     K * B * N).reshape(-1)
    bwd_flat = jnp.full((K * B * N + 1,), -1, jnp.int32).at[bidx].set(
        (b_ix * M + slot).reshape(-1))[:K * B * N].reshape(K, B * N)

    # Output coords by GATHER reconstruction instead of a third D*N-update
    # scatter (TPU scatter is update-rate bound at ~320M/s — the three
    # scatters were ~85% of the rulebook build): every live output slot
    # has >=1 link in fwd_flat; pick its first hit offset k and invert
    # c_out = (c_in + pad - off_k) / stride (exact — off_k covers c_in
    # by construction).
    hit = fwd_flat >= 0                                  # [K, B*M]
    out_valid = hit.any(0)                               # [B*M]
    first_k = jnp.argmax(hit, axis=0)                    # [B*M]
    i_m = jnp.take_along_axis(fwd_flat, first_k[None, :], 0)[0]
    ci = coords.reshape(B * N, 3)[jnp.maximum(i_m, 0)]   # [B*M, 3]
    off_m = jnp.asarray(_kernel_offsets(ksz), jnp.int32)[first_k]
    oc = ((ci + jnp.asarray(pad_a, jnp.int32) - off_m)
          // jnp.asarray(stride_a, jnp.int32))
    out_coords = jnp.where(out_valid[:, None], oc, -1).reshape(B, M, 3)
    return (out_coords, out_valid.reshape(B, M), out_grid, fwd_flat,
            bwd_flat)


# Compact backward maps for strided convs: replace the [K, B*N] dense
# bwd scatter (update-rate bound, ~4.7 ms/stage at batch 8) with a
# merge-rank lookup producing [D, B*N] maps (D = feasible candidates per
# input, 8 for k3 s2 — so the conv backward's dout gather shrinks 27N ->
# 8N rows too). Default ON: full-step A/B measured 14.45 vs 13.98
# scenes/s (the first integrated win of the fewer-gather-rows family);
# GGA_RB_COMPACT_BWD=0 restores the dense backward map.
RB_COMPACT_BWD = os.environ.get('GGA_RB_COMPACT_BWD', '1') == '1'

# How the compact bwd_d map is built: 'merge' ranks every candidate lin
# id against the reconstructed output table (two [D, M+N] sorts per
# scene, vmapped); 'scatter' carries the candidate index d through the
# pair sort and scatters each pair's output slot directly into the
# [D, B*N] map (one D*B*N-update collision-free scatter). Exact-equal
# outputs; scatter measured 1.3-1.6 ms/stage cheaper on chip
# (tools/microbench_strided_variants.py). 'auto' (default) resolves to
# scatter on TPU and merge elsewhere: under a forced-CPU GSPMD mesh the
# full train step with the scatter build never finishes compiling
# (>9 min vs 2m40 with merge — isolated to this one flag; the build
# alone compiles fine both plain and mesh-sharded, so it is a sharding-
# propagation pathology of the surrounding step graph, not the op).
RB_RANKS = os.environ.get('GGA_RB_RANKS', 'auto')


def _rb_ranks_mode():
    if RB_RANKS != 'auto':
        return RB_RANKS
    return 'scatter' if jax.default_backend() == 'tpu' else 'merge'

# Pair-major strided conv (GGA_STRIDED_PAIRMAJOR=1): skips BOTH the
# [K, B*M] fwd-map scatter in the build and the 27*M-row forward gather
# in the conv — the forward becomes a parity-class einsum on the input
# rows plus ONE D*B*N-row scatter-add into the outputs (the link count
# D*N is 3.4x smaller than K*M at k3s2 with saturated budgets). Whether
# the TPU row scatter-add beats the row gather it replaces is measured,
# not assumed (tools/microbench_strided_variants.py).
STRIDED_PAIRMAJOR = os.environ.get('GGA_STRIDED_PAIRMAJOR', '0') == '1'


def parity_k_table(kernel_size, stride):
    """Static [P, D] table of kernel-offset ids per (input parity class,
    candidate): an input at coords c (padded) reaches candidate d via
    offset off = (c mod s) + d*s, so the offset id depends only on the
    input's per-dim parity p = c mod s (P = prod(s) classes) and d.

    Returns (k_of [P, D] int32, feasible [P, D] bool) — infeasible
    (p + d*s >= k) combinations never produce a link; their table entry
    is 0 and masked."""
    ksz = _triple(kernel_size)
    s = _triple(stride)
    n_cand = [int(-(-k // st)) for k, st in zip(ksz, s)]
    ds = np.stack(np.meshgrid(*[np.arange(c) for c in n_cand],
                              indexing='ij'), -1).reshape(-1, 3)
    ps = np.stack(np.meshgrid(*[np.arange(c) for c in s],
                              indexing='ij'), -1).reshape(-1, 3)
    off = ps[:, None, :] + ds[None, :, :] * np.asarray(s)    # [P, D, 3]
    feas = (off < np.asarray(ksz)).all(-1)
    k_of = (off[..., 0] * (ksz[1] * ksz[2]) + off[..., 1] * ksz[2]
            + off[..., 2])
    return (np.where(feas, k_of, 0).astype(np.int32), feas)


def downsample_rulebook_compact(coords, valid, grid, kernel_size, stride,
                                padding, out_budget):
    """``downsample_rulebook_batched`` with a COMPACT backward map.

    Same fwd_flat/out reconstruction, but instead of scattering the
    [K, B*N] dense backward map it derives bwd_d [D, B*N] (slot of input
    n's candidate d, -1 miss) by merge-ranking the pre-sort candidate
    lin ids against the reconstructed output table — two sorts of
    [D, M+N] per scene instead of a D*N-update scatter. The kernel
    offset of pair (d, n) is parity-determined (``parity_k_table``), so
    the conv backward consumes (bwd_d, parity) with per-class weights.

    Returns:
        (out_coords [B, M, 3], out_valid [B, M], out_grid,
         fwd_flat [K, B*M], bwd_d [D, B*N] rows into [B*M],
         parity [B*N] int32 in [0, prod(stride))).
    """
    B, N = valid.shape
    M = out_budget
    ksz, stride_a, pad_a, out_grid, ds, big, K = _ds_prep(
        grid, kernel_size, stride, padding, N)
    carry_d = _rb_ranks_mode() == 'scatter'
    if carry_d:
        keys, pay, newv, slot, pair_ok, lin_dn, d_s = jax.vmap(
            lambda c, v: _ds_pairs(c, v, ksz, stride_a, pad_a, out_grid,
                                   ds, big, K, carry_d=True))(
                                       coords, valid)
    else:
        keys, pay, newv, slot, pair_ok, lin_dn = jax.vmap(
            lambda c, v: _ds_pairs(c, v, ksz, stride_a, pad_a, out_grid,
                                   ds, big, K))(coords, valid)
    if BUDGET_PRIORITY == 'dist':
        keep = jax.vmap(lambda k, nv: _budget_keep(
            k, nv, big, out_grid, M))(keys, newv)
        newv = newv & keep
        slot = jnp.cumsum(newv.astype(jnp.int32), axis=-1) - 1
        pair_ok = pair_ok & keep
    slot_ok = pair_ok & (slot >= 0) & (slot < M)
    b_ix = jax.lax.broadcasted_iota(jnp.int32, keys.shape, 0)

    assert np.int64(K) * B * max(M, N) < 2 ** 31 - 1
    k_arr = pay % K
    i_arr = pay // K
    fidx = jnp.where(slot_ok, k_arr * (B * M) + b_ix * M + slot,
                     K * B * M).reshape(-1)
    fwd_flat = jnp.full((K * B * M + 1,), -1, jnp.int32).at[fidx].set(
        (b_ix * N + i_arr).reshape(-1))[:K * B * M].reshape(K, B * M)

    hit = fwd_flat >= 0
    out_valid = hit.any(0)
    first_k = jnp.argmax(hit, axis=0)
    i_m = jnp.take_along_axis(fwd_flat, first_k[None, :], 0)[0]
    ci = coords.reshape(B * N, 3)[jnp.maximum(i_m, 0)]
    off_m = jnp.asarray(_kernel_offsets(ksz), jnp.int32)[first_k]
    oc = ((ci + jnp.asarray(pad_a, jnp.int32) - off_m)
          // jnp.asarray(stride_a, jnp.int32))
    out_coords = jnp.where(out_valid[:, None], oc, -1).reshape(B, M, 3)
    out_valid = out_valid.reshape(B, M)

    D = ds.shape[0]
    if carry_d:
        # compact bwd via ONE collision-free scatter: each sorted pair
        # already knows its output slot; carry its candidate index d
        # through the sort and write b*M + slot at (d, b*N + i).
        bidx = jnp.where(slot_ok, d_s * (B * N) + b_ix * N + i_arr,
                         D * B * N).reshape(-1)
        bwd_d = jnp.full((D * B * N + 1,), -1, jnp.int32).at[bidx].set(
            (b_ix * M + slot).reshape(-1))[:D * B * N].reshape(D, B * N)
    else:
        # compact bwd: rank every candidate's lin id in the output table
        oz, oy, ox = out_grid
        out_lin = jnp.where(
            out_valid,
            (out_coords[..., 0] * (oy * ox) + out_coords[..., 1] * ox
             + out_coords[..., 2]), big)                  # [B, M] ascending

        def ranks_one(table, queries):
            if NMAP_MERGED:
                pos, hitq = _ranks_via_merge_single(table, queries)
            else:
                pos, hitq, _ = _ranks_via_merge(table, queries)
            # an infeasible query (== big) must not match an INVALID
            # table slot (also big) — that mapped dead pairs to the
            # first invalid out row whenever the budget had slack
            # (harmless numerically, dout there is zeroed, but it
            # violates the "-1 miss" contract the scatter build keeps)
            return pos, hitq & (queries < big)
        pos, hitq = jax.vmap(ranks_one)(out_lin, lin_dn)  # [B, D, N]
        boff = jax.lax.broadcasted_iota(jnp.int32, pos.shape, 0) * M
        bwd_d = jnp.where(hitq, pos + boff, -1)
        bwd_d = bwd_d.transpose(1, 0, 2).reshape(pos.shape[1], B * N)

    sa = jnp.asarray(stride_a, jnp.int32)
    cp = coords.astype(jnp.int32) + jnp.asarray(pad_a, jnp.int32)
    pz, py, px = cp[..., 0] % sa[0], cp[..., 1] % sa[1], cp[..., 2] % sa[2]
    parity = (pz * (int(stride_a[1]) * int(stride_a[2]))
              + py * int(stride_a[2]) + px).reshape(B * N)
    return out_coords, out_valid, out_grid, fwd_flat, bwd_d, parity


@jax.custom_vjp
def _rulebook_conv_compact(features, weights, w_eff, fwd_map, bwd_d,
                           parity_oh, out_valid):
    """Strided conv identical to ``_rulebook_conv`` in the forward, with
    the feature gradient computed from the COMPACT [D, B*N] backward map:
    df[n] = sum_d dout[bwd_d[d, n]] @ w_eff[p(n), d] — a D*N-row gather
    (vs K*N dense) plus a parity-class einsum.

    Args:
        w_eff: [P, D, Cout, Cin] per-(parity, candidate) transposed
            weights = weights[k_of[p, d]].transpose(-1, -2) * feasible.
        parity_oh: [B*N, P] one-hot parity classes.
    """
    out, _ = _rbc_fwd(features, weights, w_eff, fwd_map, bwd_d,
                      parity_oh, out_valid)
    return out


def _rbc_fwd(features, weights, w_eff, fwd_map, bwd_d, parity_oh,
             out_valid):
    g = _rb_gather(features, fwd_map)                 # [K, M, Cin]
    out = jnp.einsum('knc,kcd->nd', g, weights.astype(g.dtype),
                     preferred_element_type=jnp.float32)
    out = jnp.where(out_valid[:, None], out, 0.0).astype(features.dtype)
    return out, (features, weights, w_eff, fwd_map, bwd_d, parity_oh,
                 out_valid)


def _rbc_bwd(res, dout):
    (features, weights, w_eff, fwd_map, bwd_d, parity_oh,
     out_valid) = res
    dout = jnp.where(out_valid[:, None], dout, 0.0)
    # dw: re-gather CSEs with the forward's identical gather
    g = _rb_gather(features, fwd_map)
    dw = jnp.einsum('knc,nd->kcd', g, dout,
                    preferred_element_type=jnp.float32).astype(
                        weights.dtype)
    # df from the compact map: D gathers of dout + per-parity einsum
    gd = _rb_gather(dout, bwd_d)                      # [D, N, Cout]
    tmp = jnp.einsum('dno,pdoc->pnc', gd, w_eff.astype(gd.dtype),
                     preferred_element_type=jnp.float32)
    df = jnp.einsum('pnc,np->nc', tmp,
                    parity_oh.astype(tmp.dtype),
                    preferred_element_type=jnp.float32).astype(
                        features.dtype)
    return df, dw, None, None, None, None, None


_rulebook_conv_compact.defvjp(_rbc_fwd, _rbc_bwd)


def rulebook_conv_compact(features, weights, fwd_map, bwd_d, parity,
                          out_valid, kernel_size, stride):
    """Public wrapper: builds the static per-parity weight table and the
    one-hot parity matrix, then runs the compact-backward strided conv."""
    k_of, feas = parity_k_table(kernel_size, stride)
    w_eff = (weights[k_of].transpose(0, 1, 3, 2)
             * jnp.asarray(feas, weights.dtype)[..., None, None])
    parity_oh = jax.nn.one_hot(parity, k_of.shape[0], dtype=weights.dtype)
    return _rulebook_conv_compact(features, weights, w_eff, fwd_map,
                                  bwd_d, parity_oh, out_valid)


def downsample_rulebook_pairmajor(coords, valid, grid, kernel_size,
                                  stride, padding, out_budget):
    """Strided-conv build for the PAIR-MAJOR conv: no [K, B*M] fwd-map
    scatter and no merge-ranks — only the pair enum+sort, the budget
    keep, the (cheap, <=M-update) output-table scatter, and the ONE
    collision-free D*B*N-update scatter producing the compact
    bwd_d [D, B*N] map (output row of input n's candidate d, -1 miss).

    Returns:
        (out_coords [B, M, 3], out_valid [B, M], out_grid,
         bwd_d [D, B*N] rows into [B*M], parity [B*N] int32).
    """
    B, N = valid.shape
    M = out_budget
    ksz, stride_a, pad_a, out_grid, ds, big, K = _ds_prep(
        grid, kernel_size, stride, padding, N)
    keys, pay, newv, slot, pair_ok, _, d_s = jax.vmap(
        lambda c, v: _ds_pairs(c, v, ksz, stride_a, pad_a, out_grid, ds,
                               big, K, carry_d=True))(coords, valid)
    if BUDGET_PRIORITY == 'dist':
        keep = jax.vmap(lambda k, nv: _budget_keep(
            k, nv, big, out_grid, M))(keys, newv)
        newv = newv & keep
        slot = jnp.cumsum(newv.astype(jnp.int32), axis=-1) - 1
        pair_ok = pair_ok & keep
    slot_ok = pair_ok & (slot >= 0) & (slot < M)
    b_ix = jax.lax.broadcasted_iota(jnp.int32, keys.shape, 0)
    i_arr = pay // K
    D = ds.shape[0]

    # output table: <=M live updates per scene (masked to first-pairs)
    oidx = jnp.where(newv & slot_ok, b_ix * M + slot, B * M).reshape(-1)
    out_lin = jnp.full((B * M + 1,), big, jnp.int32).at[oidx].set(
        jnp.where(newv, keys, big).reshape(-1))[:B * M]
    out_valid = out_lin < big
    oz, oy, ox = out_grid
    zz = out_lin // (oy * ox)
    yy = (out_lin % (oy * ox)) // ox
    xx = out_lin % ox
    out_coords = jnp.where(
        out_valid[:, None],
        jnp.stack([zz, yy, xx], -1).astype(jnp.int32), -1)

    bidx = jnp.where(slot_ok, d_s * (B * N) + b_ix * N + i_arr,
                     D * B * N).reshape(-1)
    bwd_d = jnp.full((D * B * N + 1,), -1, jnp.int32).at[bidx].set(
        (b_ix * M + slot).reshape(-1))[:D * B * N].reshape(D, B * N)

    sa = jnp.asarray(stride_a, jnp.int32)
    cp = coords.astype(jnp.int32) + jnp.asarray(pad_a, jnp.int32)
    pz, py, px = cp[..., 0] % sa[0], cp[..., 1] % sa[1], cp[..., 2] % sa[2]
    parity = (pz * (int(stride_a[1]) * int(stride_a[2]))
              + py * int(stride_a[2]) + px).reshape(B * N)
    return (out_coords.reshape(B, M, 3), out_valid.reshape(B, M),
            out_grid, bwd_d, parity)


@jax.custom_vjp
def _rulebook_conv_pairmajor(features, weights, w_fwd, w_eff, k_of_flat,
                             bwd_d, parity_oh, out_valid):
    """Strided conv in PAIR-MAJOR form: the forward never gathers — it
    computes every input row's contribution to each of its D candidate
    outputs with a parity-class einsum (w_fwd [P, D, Cin, Cout]) and
    scatter-adds the D*B*N contribution rows into the output table
    (f32 accumulate; identical to the gather forward up to f32 add
    order). The backward is the compact path's: df = D dout-gathers +
    per-parity einsum; dw in (p, d) class space scattered onto the K
    kernel slots (exact — infeasible (p, d) products are identically
    zero because their pairs never exist).
    """
    out, _ = _rpm_fwd(features, weights, w_fwd, w_eff, k_of_flat, bwd_d,
                      parity_oh, out_valid)
    return out


def _rpm_fwd(features, weights, w_fwd, w_eff, k_of_flat, bwd_d,
             parity_oh, out_valid):
    D, R = bwd_d.shape
    Mo = out_valid.shape[0]
    fp = jnp.einsum('nc,np->pnc', features,
                    parity_oh.astype(features.dtype))
    contrib = jnp.einsum('pnc,pdco->dno', fp, w_fwd.astype(fp.dtype),
                         preferred_element_type=jnp.float32)
    idx = jnp.where(bwd_d >= 0, bwd_d, Mo).reshape(-1)
    out = jnp.zeros((Mo + 1, w_fwd.shape[-1]), jnp.float32).at[idx].add(
        contrib.reshape(D * R, -1))[:Mo]
    out = jnp.where(out_valid[:, None], out, 0.0).astype(features.dtype)
    return out, (features, weights, w_fwd, w_eff, k_of_flat, bwd_d,
                 parity_oh, out_valid)


def _rpm_bwd(res, dout):
    (features, weights, w_fwd, w_eff, k_of_flat, bwd_d, parity_oh,
     out_valid) = res
    dout = jnp.where(out_valid[:, None], dout, 0.0)
    gd = _rb_gather(dout, bwd_d)                      # [D, R, Cout]
    # df exactly as the compact path
    tmp = jnp.einsum('dno,pdoc->pnc', gd, w_eff.astype(gd.dtype),
                     preferred_element_type=jnp.float32)
    df = jnp.einsum('pnc,np->nc', tmp,
                    parity_oh.astype(tmp.dtype),
                    preferred_element_type=jnp.float32).astype(
                        features.dtype)
    # dw per (parity, candidate) class, then K-slot static scatter
    fp = jnp.einsum('nc,np->pnc', features,
                    parity_oh.astype(features.dtype))
    pdk = jnp.einsum('pnc,dno->pdco', fp, gd.astype(fp.dtype),
                     preferred_element_type=jnp.float32)
    P, D = pdk.shape[:2]
    K = weights.shape[0]
    dw = jnp.zeros((K,) + pdk.shape[2:], jnp.float32).at[k_of_flat].add(
        pdk.reshape((P * D,) + pdk.shape[2:])).astype(weights.dtype)
    return df, dw, None, None, None, None, None, None


_rulebook_conv_pairmajor.defvjp(_rpm_fwd, _rpm_bwd)


def rulebook_conv_pairmajor(features, weights, bwd_d, parity, out_valid,
                            kernel_size, stride):
    """Public wrapper for the pair-major strided conv: builds the
    per-(parity, candidate) forward/backward weight tables and the
    one-hot parity matrix (consumes ``downsample_rulebook_pairmajor``'s
    maps)."""
    k_of, feas = parity_k_table(kernel_size, stride)
    fm = jnp.asarray(feas, weights.dtype)[..., None, None]
    w_fwd = weights[k_of] * fm                        # [P, D, Cin, Cout]
    w_eff = weights[k_of].transpose(0, 1, 3, 2) * fm  # [P, D, Cout, Cin]
    parity_oh = jax.nn.one_hot(parity, k_of.shape[0], dtype=weights.dtype)
    return _rulebook_conv_pairmajor(
        features, weights, w_fwd, w_eff,
        jnp.asarray(k_of.reshape(-1), jnp.int32), bwd_d, parity_oh,
        out_valid)


def downsample_rulebook(st: SparseTensor, kernel_size, stride, padding,
                        out_budget):
    """Output sites of a strided sparse conv PLUS its full gather rulebook,
    all derived from one sort of the (input, output-candidate) pairs.

    Enumerates the <= prod(ceil(k/s)) feasible output candidates per input
    (each covering (input, output) pair exactly once, tagged with its
    kernel-offset id), sorts the pairs by output linear id carrying
    (input_row * K + offset_id) as payload, dedupes outputs into the
    static budget, and scatters the pairs into dense gather maps:

      fwd_map[k, m] = input row feeding output m at offset k   (-1 if none)
      bwd_map[k, n] = output row fed by input n at offset k    (-1 if none)

    Both scatters are collision-free — for a fixed site and offset the
    partner is unique (``c = s*o - p + off``) — and cost only ~D*N
    elements, replacing the ~(K+1)*(M+N)-key searchsorted sorts plus
    their element-rate rank scatters that a per-conv neighbor resolution
    would pay in forward AND backward.

    Returns:
        (out_coords [M, 3], out_valid [M], out_grid,
         fwd_map [K, M] int32, bwd_map [K, N] int32).
    """
    ksz, stride_a, pad_a, out_grid, ds, big, K = _ds_prep(
        st.grid, kernel_size, stride, padding, st.coords.shape[0])
    oz, oy, ox = out_grid
    N = st.coords.shape[0]
    keys, pay, newv, slot, pair_ok, _ = _ds_pairs(
        st.coords, st.valid, ksz, stride_a, pad_a, out_grid, ds, big, K)
    if BUDGET_PRIORITY == 'dist':
        keep = _budget_keep(keys, newv, big, out_grid, out_budget)
        newv = newv & keep
        slot = jnp.cumsum(newv.astype(jnp.int32)) - 1
        pair_ok = pair_ok & keep
    slot_ok = pair_ok & (slot >= 0) & (slot < out_budget)

    out_lin = jnp.full((out_budget + 1,), big, jnp.int32).at[
        jnp.where(newv & slot_ok, slot, out_budget)].set(
        jnp.where(newv, keys, big))[:out_budget]
    out_valid = out_lin < big
    zz = out_lin // (oy * ox)
    yy = (out_lin % (oy * ox)) // ox
    xx = out_lin % ox
    out_coords = jnp.where(
        out_valid[:, None],
        jnp.stack([zz, yy, xx], -1).astype(jnp.int32), -1)

    k_arr = pay % K
    i_arr = pay // K
    fidx = jnp.where(slot_ok, k_arr * out_budget + slot, K * out_budget)
    fwd_map = jnp.full((K * out_budget + 1,), -1, jnp.int32).at[fidx].set(
        i_arr)[:K * out_budget].reshape(K, out_budget)
    bidx = jnp.where(slot_ok, k_arr * N + i_arr, K * N)
    bwd_map = jnp.full((K * N + 1,), -1, jnp.int32).at[bidx].set(
        slot)[:K * N].reshape(K, N)
    return out_coords, out_valid, out_grid, fwd_map, bwd_map


@jax.custom_vjp
def _rulebook_conv(features, weights, fwd_map, bwd_map, out_valid):
    """Strided sparse conv on a precomputed rulebook.

    Custom VJP: df gathers dout rows through bwd_map (same kernel offset,
    transposed weights) — a gather+GEMM exactly like the forward, avoiding
    TPU scatter-adds in the backward.
    """
    out, _ = _rb_fwd(features, weights, fwd_map, bwd_map, out_valid)
    return out


def _rb_gather(rows, mapping):
    hit = (mapping >= 0).reshape(-1)
    g = jnp.where(hit[:, None],
                  rows[jnp.maximum(mapping, 0).reshape(-1)],
                  jnp.zeros((), rows.dtype))
    return g.reshape(mapping.shape + (rows.shape[-1],))


def _rb_gather_t(rows, mapping):
    """_rb_gather transposed to [K, C, Q] via the windowed kernel (the
    rulebook maps are monotone per scene/offset for the same sorted
    reason the neighbor maps are)."""
    return _gather_t(rows, jnp.maximum(mapping, 0), mapping >= 0)


def _rb_fwd(features, weights, fwd_map, bwd_map, out_valid):
    if WINDOW_GATHER and _wg_ok(features.shape[-1]):
        g_t = _rb_gather_t(features, fwd_map)         # [K, Cin, M]
        out = jnp.einsum('kcn,kcd->nd', g_t, weights.astype(g_t.dtype),
                         preferred_element_type=jnp.float32)
    else:
        g = _rb_gather(features, fwd_map)             # [K, M, Cin]
        out = jnp.einsum('knc,kcd->nd', g, weights.astype(g.dtype),
                         preferred_element_type=jnp.float32)
    out = jnp.where(out_valid[:, None], out, 0.0).astype(features.dtype)
    return out, (features, weights, fwd_map, bwd_map, out_valid)


def _rb_bwd(res, dout):
    features, weights, fwd_map, bwd_map, out_valid = res
    dout = jnp.where(out_valid[:, None], dout, 0.0)
    if (WINDOW_GATHER and _wg_ok(features.shape[-1])
            and _wg_ok(dout.shape[-1])):
        g_t = _rb_gather_t(features, fwd_map)         # CSEs with forward
        dw = jnp.einsum('kcn,nd->kcd', g_t, dout,
                        preferred_element_type=jnp.float32).astype(
                            weights.dtype)
        gd_t = _rb_gather_t(dout, bwd_map)            # [K, Cout, N]
        df = jnp.einsum('kdn,kdc->nc', gd_t,
                        weights.transpose(0, 2, 1).astype(gd_t.dtype),
                        preferred_element_type=jnp.float32).astype(
                            features.dtype)
        return df, dw, None, None, None
    # recompute is free: XLA CSEs it with the forward's gather
    g = _rb_gather(features, fwd_map)
    dw = jnp.einsum('knc,nd->kcd', g, dout,
                    preferred_element_type=jnp.float32).astype(
                        weights.dtype)
    gd = _rb_gather(dout, bwd_map)                    # [K, N, Cout]
    df = jnp.einsum('knd,kdc->nc', gd,
                    weights.transpose(0, 2, 1).astype(gd.dtype),
                    preferred_element_type=jnp.float32).astype(
                        features.dtype)
    return df, dw, None, None, None


_rulebook_conv.defvjp(_rb_fwd, _rb_bwd)


def rulebook_conv(features, weights, fwd_map, bwd_map, out_valid):
    """Public alias of the rulebook conv core (for modules that manage
    their own rulebooks, e.g. SparseUNet's encoder/decoder pairing)."""
    return _rulebook_conv(features, weights, fwd_map, bwd_map, out_valid)


def sparse_inverse_conv(features, weights, fwd_map, bwd_map, in_valid,
                        bias=None):
    """SparseInverseConv3d: deconvolve low-res features back onto the
    PRE-downsample active set of the strided conv whose rulebook is given
    (spconv's indice_key reuse — consumed by SparseUNet's up path,
    /root/reference/mmdet3d/models/middle_encoders/sparse_unet.py:279-286).

    The inverse relation is the rulebook transposed: out[n] sums
    W[k] @ feats_low[bwd_map[k, n]] over the offsets that linked input row
    n to a downsampled site — i.e. ``_rulebook_conv`` with the fwd/bwd
    maps swapped (its VJP transposes back automatically).

    Args:
        features: [M, C_low] downsampled features.
        weights: [K, C_low, C_out].
        fwd_map/bwd_map: from ``downsample_rulebook`` of the matching
            strided conv.
        in_valid: [N] validity of the pre-downsample active set.
    """
    out = _rulebook_conv(features, weights, bwd_map, fwd_map, in_valid)
    if bias is not None:
        out = out + bias
    return out


def sparse_conv_fast(st: SparseTensor, weights, kernel_size, stride,
                     padding, out_budget, bias=None):
    """sparse_conv on the one-sort rulebook with a scatter-free VJP."""
    out_coords, out_valid, out_grid, fwd_map, bwd_map = downsample_rulebook(
        st, kernel_size, stride, padding, out_budget)
    out = _rulebook_conv(st.features, weights, fwd_map, bwd_map, out_valid)
    if bias is not None:
        out = out + bias
    return SparseTensor(features=out, coords=out_coords, valid=out_valid,
                        grid=out_grid)


# ---------------------------------------------------------------------------
# x-triple submanifold conv: 9 wide-row gathers instead of 27 row gathers.
#
# XLA's TPU gather is ROW-rate bound (~550 M rows/s measured,
# tools/microbench_slice_gather.py): gathering [N, 3C] rows costs the same
# as [N, C] rows, so the 27 per-offset gathers of subm_conv_with_map can
# collapse to 9 — one per (dz, dy) offset group — against a pre-shifted
# concat F3[m] = [F[m-1], F[m], F[m+1]]. Coordinates are sorted by
# linearized id with x fastest, so the (up to 3) present x-candidates
# t-1, t, t+1 of a group always occupy CONSECUTIVE table positions
# starting at rank_lt(t-1); anchoring the wide gather there covers every
# present neighbor, and a per-slot one-hot select (built once per stage,
# like the neighbor map) routes each sub-row to its kernel x-slot — exact
# for every present/absent combination, including the
# center-missing-side-present case a naive slot alignment gets wrong.


def build_triple_map(st: SparseTensor):
    """Anchor rows + slot->kernel-x-offset select for the 3x3x3 subm conv.

    Returns:
        anchor [9, N] int32 — rows to gather from the [N, 3C] pre-shifted
            feature concat (9 (dz, dy) offset groups, row-major);
        sel [9, N, 3, 3] bool — sel[g, n, j, k] routes gathered sub-row j
            (table position anchor-1+j) to kernel x-slot k; at most one k
            per (g, n, j), zero where the sub-row is not a real neighbor.
    """
    nz, ny, nx = st.grid
    N = st.coords.shape[0]
    lin_in, big = _linearize(st.coords, st.valid, st.grid)

    # 9 (dz, dy) groups; x component fixed at -1 (the t-1 query)
    offs_zy = _kernel_offsets((3, 3, 1))                   # [9, 3]
    base = st.coords.astype(jnp.int32) - 1                 # - pad
    tgt = base[None, :, :] + jnp.asarray(offs_zy, jnp.int32)[:, None, :]
    zy_ok = ((tgt[..., 0] >= 0) & (tgt[..., 0] < nz)
             & (tgt[..., 1] >= 0) & (tgt[..., 1] < ny))    # [9, N]
    t_minus = (tgt[..., 0].astype(lin_in.dtype) * (ny * nx)
               + tgt[..., 1] * nx + tgt[..., 2])           # lin of x-1

    _, hit, rank_le = _ranks_via_merge(lin_in, t_minus)
    # rank_lt(t-1) = rank_le - hit; anchor = rank_lt + 1, so the slots
    # anchor-1+j (j = 0..2) start at the first present candidate
    anchor = jnp.clip(rank_le - hit.astype(jnp.int32) + 1, 0,
                      max(N - 1, 0))

    # expected lin per kernel x-slot + per-slot bounds
    e = t_minus[..., None] + jnp.arange(3, dtype=lin_in.dtype)  # [9,N,3]
    x_ok = ((tgt[..., 2][..., None] + jnp.arange(3)) >= 0) & \
        ((tgt[..., 2][..., None] + jnp.arange(3)) < nx)
    ok = zy_ok[..., None] & x_ok & st.valid[None, :, None]      # [9,N,3]

    # table lin at slot positions anchor-1+j (sentinels never match)
    lin_pad = jnp.concatenate(
        [jnp.full((1,), -big, lin_in.dtype), lin_in,
         jnp.full((1,), big, lin_in.dtype)])
    q = anchor[..., None] + jnp.arange(3, dtype=jnp.int32)  # a-1+j (+1 pad)
    l_at = lin_pad[q]                                       # [9, N, 3]
    sel = (l_at[..., None] == e[:, :, None, :]) & ok[:, :, None, :]
    return anchor, sel


def _triple_apply(features, anchor, sel, w9):
    """sum_g sum_j sum_k sel * F3[anchor][j] @ w9[g, k] -> [N, D]."""
    N, C = features.shape
    zero = jnp.zeros((1, C), features.dtype)
    f_pad = jnp.concatenate([zero, features, zero])
    f3 = jnp.concatenate([f_pad[:-2], f_pad[1:-1], f_pad[2:]],
                         axis=-1)                          # [N, 3C]
    g = f3[anchor].reshape(anchor.shape[0], N, 3, C)       # [9, N, 3, C]
    bucket = jnp.einsum('gnjk,gnjc->gnkc', sel.astype(features.dtype), g)
    return jnp.einsum('gnkc,gkcd->nd', bucket,
                      w9.astype(features.dtype),
                      preferred_element_type=jnp.float32), bucket


@jax.custom_vjp
def subm_conv_triple(features, valid, anchor, sel, weights):
    """3x3x3 submanifold conv via 9 wide-row gathers (see module note).

    Exact drop-in for ``subm_conv_with_map`` given
    (anchor, sel) = build_triple_map. Backward mirrors the forward
    (offset symmetry: weights flipped over all 27 slots + transposed)
    and re-derives the weight gradient from a recomputed bucket; an
    optimization barrier stops XLA from CSE-ing the recompute with the
    forward's gather — keeping the wide [N, 3C] intermediates live
    across fwd->bwd is what regressed the round-2 integrated step.

    Args:
        features [N, Cin]; valid [N]; anchor/sel from build_triple_map;
        weights [27, Cin, Cout] (row-major (z, y, x) offsets).
    """
    out, _ = _triple_fwd(features, valid, anchor, sel, weights)
    return out


def _triple_fwd(features, valid, anchor, sel, weights):
    C, D = weights.shape[1:]
    out, _ = _triple_apply(features, anchor, sel,
                           weights.reshape(9, 3, C, D))
    out = jnp.where(valid[:, None], out, 0.0).astype(features.dtype)
    return out, (features, valid, anchor, sel, weights)


def _triple_bwd(res, dout):
    features, valid, anchor, sel, weights = res
    C, D = weights.shape[1:]
    dout = jnp.where(valid[:, None], dout, 0.0)

    # stop fwd<->bwd CSE: recompute the gathers instead of keeping the
    # [N, 3C] concat + [9, N, 3, C] bucket live across the whole step
    f_b = jax.lax.optimization_barrier(features)
    d_b = jax.lax.optimization_barrier(dout)

    _, bucket = _triple_apply(f_b, anchor, sel,
                              jnp.zeros((9, 3, C, 1), features.dtype))
    dw = jnp.einsum('gnkc,nd->gkcd', bucket, dout,
                    preferred_element_type=jnp.float32)
    dw = dw.reshape(27, C, D).astype(weights.dtype)

    # df via offset symmetry: m receives from n at offset o iff n is m's
    # neighbor at offset 26 - o -> same maps, weights flipped+transposed
    w_m = jnp.flip(weights, axis=0).transpose(0, 2, 1)     # [27, D, C]
    df, _ = _triple_apply(d_b, anchor, sel, w_m.reshape(9, 3, D, C))
    df = jnp.where(valid[:, None], df, 0.0).astype(features.dtype)
    return df, None, None, None, dw


subm_conv_triple.defvjp(_triple_fwd, _triple_bwd)


# env-switchable map builder so the engine can be A/B'd on the full
# train step without code edits (GGA_SUBM_TRIPLE=1 -> x-triple path)
SUBM_TRIPLE = os.environ.get('GGA_SUBM_TRIPLE', '0') == '1'


def build_subm_map(st: SparseTensor, kernel_size=(3, 3, 3)):
    """Stage-shared submanifold gather map: (nmap [K, N], hit [K, N]) on
    the per-offset path, or (anchor [9, N], sel [9, N, 3, 3]) on the
    x-triple path (GGA_SUBM_TRIPLE=1, 3x3x3 kernels only). Consumers
    distinguish by the second array's rank."""
    if SUBM_TRIPLE and _triple(kernel_size) == (3, 3, 3):
        return build_triple_map(st)
    return build_neighbor_map(st, kernel_size)
