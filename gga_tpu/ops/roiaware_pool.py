"""RoIAware 3D pooling — TPU-native replacement for mmcv's CUDA
``roiaware_pool3d`` (consumed by PartA2's RoI extractors,
/root/reference/mmdet3d/models/roi_heads/roi_extractors/single_roiaware_extractor.py
and configs/_base_/models/parta2.py: RoIAwarePool3d out_size=14).

Static-shape design: each RoI selects up to ``pts_budget`` in-box voxels
via one batched sort, then scatter-max / scatter-mean into its
[S, S, S] cell grid. All math is vectorized over (rois, points); batch via
vmap in callers.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def roiaware_pool3d(feats, centers, valid, rois, out_size=14, mode='max',
                    pts_budget=512):
    """Pool point/voxel features into per-RoI voxel grids.

    Args:
        feats: [N, C] features.
        centers: [N, 3] lidar xyz positions.
        valid: [N] bool.
        rois: [R, 7] lidar bottom-center boxes (x, y, z, dx, dy, dz, yaw).
        out_size: cells per axis (S).
        mode: 'max' | 'avg'.
        pts_budget: max points pooled per RoI (selected deterministically
            in index order, like the CUDA op's first-come capping).

    Returns:
        (pooled [R, S, S, S, C], occupancy [R, S, S, S] bool) with cell
        layout (x, y, z).
    """
    S = out_size
    N, C = feats.shape
    R = rois.shape[0]

    dx, dy, dz = rois[:, 3], rois[:, 4], rois[:, 5]
    cos = jnp.cos(-rois[:, 6])[:, None]
    sin = jnp.sin(-rois[:, 6])[:, None]
    px = centers[None, :, 0] - rois[:, 0:1]          # [R, N]
    py = centers[None, :, 1] - rois[:, 1:2]
    pz = centers[None, :, 2] - rois[:, 2:3]
    lx = px * cos - py * sin
    ly = px * sin + py * cos

    ix = jnp.floor((lx / jnp.maximum(dx[:, None], 1e-6) + 0.5) * S)
    iy = jnp.floor((ly / jnp.maximum(dy[:, None], 1e-6) + 0.5) * S)
    iz = jnp.floor(pz / jnp.maximum(dz[:, None], 1e-6) * S)
    cell = (ix.astype(jnp.int32) * S * S + iy.astype(jnp.int32) * S
            + iz.astype(jnp.int32))
    in_box = ((ix >= 0) & (ix < S) & (iy >= 0) & (iy < S)
              & (iz >= 0) & (iz < S) & valid[None, :])

    # static top-k selection of in-box points, in index order
    pts_budget = min(pts_budget, N)
    idx = jax.lax.broadcasted_iota(jnp.int32, (R, N), 1)
    key = jnp.where(in_box, idx, N)
    sel = jax.lax.sort(key, dimension=-1)[:, :pts_budget]    # [R, B]
    sel_ok = sel < N
    sel_c = jnp.minimum(sel, N - 1)
    sel_feats = feats[sel_c.reshape(-1)].reshape(R, pts_budget, C)
    sel_cell = jnp.take_along_axis(cell, sel_c, axis=1)
    sel_cell = jnp.where(sel_ok, sel_cell, S * S * S)        # dump slot

    def pool_one(f, cellr, okr):
        f = jnp.where(okr[:, None], f, 0.0)
        if mode == 'max':
            grid = jnp.full((S * S * S + 1, C), -jnp.inf, f.dtype)
            grid = grid.at[cellr].max(jnp.where(okr[:, None], f, -jnp.inf))
            cnt = jnp.zeros((S * S * S + 1,), jnp.int32).at[cellr].add(
                okr.astype(jnp.int32))
            occ = cnt[:S * S * S] > 0
            out = jnp.where(occ[:, None], grid[:S * S * S], 0.0)
        else:
            ssum = jnp.zeros((S * S * S + 1, C), f.dtype).at[cellr].add(f)
            cnt = jnp.zeros((S * S * S + 1,), jnp.int32).at[cellr].add(
                okr.astype(jnp.int32))
            occ = cnt[:S * S * S] > 0
            out = ssum[:S * S * S] / jnp.maximum(cnt[:S * S * S, None], 1)
            out = jnp.where(occ[:, None], out, 0.0)
        return out.reshape(S, S, S, C), occ.reshape(S, S, S)

    return jax.vmap(pool_one)(sel_feats, sel_cell, sel_ok)
