"""2D RoIAlign — TPU-native replacement for mmcv's CUDA roi_align.

Behavioral mirror of the RoIAlign layer the reference's nuImages models
consume (/root/reference/configs/_base_/models/mask_rcnn_r50_fpn.py:40,
``roi_layer=dict(type='RoIAlign', output_size=7, sampling_ratio=0)``).

Design: all shapes static. Each RoI is divided into ``out x out`` bins
with ``samples x samples`` bilinear sample points per bin; the four
neighbor taps of every sample point become four row gathers on the
flattened [H*W, C] map (the engine's preferred access pattern — row
gathers lower well on TPU, scatter never appears). sampling_ratio=0 in
the reference means adaptive ceil(roi_h/out) samples per bin — a
data-dependent shape; here a FIXED samples=2 grid is used (the value
the adaptive rule picks for typical RoIs), a documented TPU delta.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def roi_align(feat, rois, out_size: int, samples: int = 2,
              spatial_scale: float = 1.0, aligned: bool = True):
    """Bilinear RoIAlign on one feature map.

    Args:
        feat: [H, W, C] feature map.
        rois: [R, 4] (x1, y1, x2, y2) in IMAGE coordinates.
        out_size: output bins per side.
        samples: bilinear sample points per bin side (static).
        spatial_scale: image -> feature coordinate scale (1/stride).
        aligned: half-pixel alignment (mmcv aligned=True semantics).

    Returns:
        [R, out_size, out_size, C].
    """
    H, W, C = feat.shape
    R = rois.shape[0]
    off = 0.5 if aligned else 0.0
    x1 = rois[:, 0] * spatial_scale - off
    y1 = rois[:, 1] * spatial_scale - off
    x2 = rois[:, 2] * spatial_scale - off
    y2 = rois[:, 3] * spatial_scale - off
    bin_w = jnp.maximum(x2 - x1, 1e-4) / out_size
    bin_h = jnp.maximum(y2 - y1, 1e-4) / out_size

    # sample-point grid: [out*samples] fractional offsets per axis
    s = (jnp.arange(out_size * samples, dtype=jnp.float32) + 0.5) / samples
    sx = x1[:, None] + bin_w[:, None] * s[None, :]      # [R, out*S]
    sy = y1[:, None] + bin_h[:, None] * s[None, :]

    def bilinear(py, px):
        """py [R, Ny], px [R, Nx] -> [R, Ny, Nx, C]."""
        y0 = jnp.floor(py)
        x0 = jnp.floor(px)
        wy1 = (py - y0)[..., None]                       # [R, Ny, 1]
        wx1 = (px - x0)[..., None]
        y0i = jnp.clip(y0.astype(jnp.int32), 0, H - 1)
        y1i = jnp.clip(y0i + 1, 0, H - 1)
        x0i = jnp.clip(x0.astype(jnp.int32), 0, W - 1)
        x1i = jnp.clip(x0i + 1, 0, W - 1)
        # outside-map samples contribute zero (mmcv clips then zeroes)
        oky = ((py >= -1.0) & (py <= H))[..., None]
        okx = ((px >= -1.0) & (px <= W))[..., None]
        flat = feat.reshape(H * W, C)

        def rows(yi, xi):
            # [R, Ny, Nx, C] from [R, Ny] x [R, Nx] index outer product
            lin = yi[:, :, None] * W + xi[:, None, :]
            return flat[lin.reshape(R, -1)].reshape(
                R, yi.shape[1], xi.shape[1], C)

        v = ((1 - wy1)[:, :, None] * (1 - wx1)[:, None] * rows(y0i, x0i)
             + (1 - wy1)[:, :, None] * wx1[:, None] * rows(y0i, x1i)
             + wy1[:, :, None] * (1 - wx1)[:, None] * rows(y1i, x0i)
             + wy1[:, :, None] * wx1[:, None] * rows(y1i, x1i))
        return v * oky[:, :, None] * okx[:, None]

    vals = bilinear(sy, sx)                              # [R, oS, oS, C]
    vals = vals.reshape(R, out_size, samples, out_size, samples, C)
    return vals.mean(axis=(2, 4))


def multilevel_roi_align(feats, rois, out_size: int, strides,
                         samples: int = 2, finest_scale: float = 56.0):
    """SingleRoIExtractor: route each RoI to one FPN level by scale.

    Mirrors mmdet's map_roi_levels (level = floor(log2(sqrt(area) /
    finest_scale + 1e-6)) clamped to the available levels). Static
    implementation: align on EVERY level and one-hot select — 4x the
    FLOPs of routed execution but branch-free.

    Args:
        feats: list of [H_l, W_l, C] maps (increasing stride).
        rois: [R, 4] image-coordinate boxes.
        strides: per-level feature strides.

    Returns:
        [R, out_size, out_size, C].
    """
    area = jnp.maximum(rois[:, 2] - rois[:, 0], 0.0) * jnp.maximum(
        rois[:, 3] - rois[:, 1], 0.0)
    lvl = jnp.floor(jnp.log2(jnp.sqrt(area) / finest_scale + 1e-6))
    lvl = jnp.clip(lvl, 0, len(feats) - 1).astype(jnp.int32)
    out = 0.0
    for i, (f, st) in enumerate(zip(feats, strides)):
        a = roi_align(f, rois, out_size, samples=samples,
                      spatial_scale=1.0 / st)
        out = out + jnp.where((lvl == i)[:, None, None, None], a, 0.0)
    return out
