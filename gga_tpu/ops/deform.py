"""Deformable conv sampling for dense BEV/image maps.

TPU rebuild of mmcv's DeformConv2d (v1, as used by CenterPoint's
DCNSeparateHead — /root/reference/mmdet3d/models/dense_heads/
centerpoint_head.py:125 with dcn_config type='DCN'): per-pixel learned
offsets shift each kernel tap's sampling point, values are bilinearly
interpolated.

TPU-first shape: instead of mmcv's per-pixel CUDA im2col, the K*K taps'
fractional sample points are resolved with FOUR flat row gathers (one
per bilinear corner, all taps batched into one index vector) and the
kernel contraction runs as a single MXU einsum over the stacked taps.
Zero padding outside the map matches mmcv's im2col behavior.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _tap_offsets(kernel_size):
    k = int(kernel_size)
    r = (k - 1) // 2
    dy, dx = np.meshgrid(np.arange(k) - r, np.arange(k) - r,
                         indexing='ij')
    return dy.reshape(-1).astype(np.float32), \
        dx.reshape(-1).astype(np.float32)


def deform_sample(x, offsets, kernel_size=3):
    """Bilinear-sample each kernel tap at its offset location.

    Args:
        x: [B, H, W, C] feature map.
        offsets: [B, H, W, K*K*2] learned (dy, dx) per tap, mmcv channel
            order (dy0, dx0, dy1, dx1, ...).
        kernel_size: K (stride 1, SAME padding — the DCNSeparateHead
            configuration).

    Returns:
        [B, H, W, K*K, C] samples (zero where the sample point falls
        outside the map, matching zero padding).
    """
    B, H, W, C = x.shape
    KK = kernel_size * kernel_size
    off = offsets.reshape(B, H, W, KK, 2).astype(jnp.float32)
    dy, dx = _tap_offsets(kernel_size)

    yy = jax.lax.broadcasted_iota(jnp.float32, (B, H, W, KK), 1)
    xx = jax.lax.broadcasted_iota(jnp.float32, (B, H, W, KK), 2)
    py = yy + jnp.asarray(dy) + off[..., 0]
    px = xx + jnp.asarray(dx) + off[..., 1]

    y0 = jnp.floor(py)
    x0 = jnp.floor(px)
    fy = py - y0
    fx = px - x0

    xf = x.reshape(B * H * W, C)
    b_ix = jax.lax.broadcasted_iota(jnp.int32, (B, H, W, KK), 0)

    def corner(yi, xi):
        ok = (yi >= 0) & (yi < H) & (xi >= 0) & (xi < W)
        yc = jnp.clip(yi, 0, H - 1).astype(jnp.int32)
        xc = jnp.clip(xi, 0, W - 1).astype(jnp.int32)
        idx = ((b_ix * H + yc) * W + xc).reshape(-1)
        g = xf[idx].reshape(B, H, W, KK, C)
        return g, ok.astype(x.dtype)

    g00, m00 = corner(y0, x0)
    g01, m01 = corner(y0, x0 + 1)
    g10, m10 = corner(y0 + 1, x0)
    g11, m11 = corner(y0 + 1, x0 + 1)

    w00 = ((1 - fy) * (1 - fx)).astype(x.dtype) * m00
    w01 = ((1 - fy) * fx).astype(x.dtype) * m01
    w10 = (fy * (1 - fx)).astype(x.dtype) * m10
    w11 = (fy * fx).astype(x.dtype) * m11
    return (g00 * w00[..., None] + g01 * w01[..., None]
            + g10 * w10[..., None] + g11 * w11[..., None])


def deform_conv2d(x, offsets, weights, kernel_size=3, groups=1):
    """Deformable conv: sample taps, contract on the MXU.

    Args:
        x: [B, H, W, C].
        offsets: [B, H, W, K*K*2].
        weights: [K*K, C // groups, Cout] tap-major kernel; with conv
            groups, Cout splits as groups * (Cout // groups) and group g
            reads channel slice g of the input.
    Returns:
        [B, H, W, Cout].
    """
    B, H, W, C = x.shape
    s = deform_sample(x, offsets, kernel_size)       # [B, H, W, KK, C]
    if groups == 1:
        return jnp.einsum('bhwkc,kcd->bhwd', s,
                          weights.astype(s.dtype),
                          preferred_element_type=jnp.float32).astype(
                              x.dtype)
    KK = kernel_size * kernel_size
    cg = C // groups
    dg = weights.shape[-1] // groups
    sg = s.reshape(B, H, W, KK, groups, cg)
    wg = weights.reshape(KK, cg, groups, dg)
    out = jnp.einsum('bhwkgc,kcgd->bhwgd', sg, wg.astype(s.dtype),
                     preferred_element_type=jnp.float32)
    return out.reshape(B, H, W, groups * dg).astype(x.dtype)
