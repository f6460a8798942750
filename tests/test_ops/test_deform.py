"""Deformable conv sampling (ops/deform.py) + DCNSeparateHead wiring.

Semantics pinned against mmcv's DeformConv2d (the reference
DCNSeparateHead's adapter, centerpoint_head.py:125): zero offsets reduce
to a standard conv with zero padding; fractional offsets bilinearly
interpolate; samples outside the map read zero.
"""
import jax
import jax.numpy as jnp
import numpy as np

from gga_tpu.ops.deform import deform_conv2d, deform_sample


def _ref_conv3x3(x, w):
    """Plain zero-padded 3x3 conv, taps ordered like _tap_offsets."""
    B, H, W, C = x.shape
    xp = np.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    out = np.zeros((B, H, W, w.shape[-1]), np.float32)
    k = 0
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            patch = xp[:, 1 + dy:1 + dy + H, 1 + dx:1 + dx + W]
            out += patch @ w[k]
            k += 1
    return out


def test_zero_offsets_match_standard_conv():
    rng = np.random.RandomState(0)
    x = rng.randn(2, 6, 7, 4).astype(np.float32)
    w = rng.randn(9, 4, 5).astype(np.float32)
    off = np.zeros((2, 6, 7, 18), np.float32)
    got = np.asarray(deform_conv2d(jnp.asarray(x), jnp.asarray(off),
                                   jnp.asarray(w)))
    np.testing.assert_allclose(got, _ref_conv3x3(x, w), rtol=1e-4,
                               atol=1e-4)


def test_bilinear_fractional_offset():
    # one pixel map with a linear ramp: value at (y, x) = 10y + x; a
    # +0.5/+0.25 offset on the CENTER tap must interpolate exactly
    H, W = 5, 5
    ramp = (10 * np.arange(H)[:, None] + np.arange(W)[None, :])
    x = ramp[None, :, :, None].astype(np.float32)
    off = np.zeros((1, H, W, 18), np.float32)
    off[..., 2 * 4 + 0] = 0.5    # center tap (k=4) dy
    off[..., 2 * 4 + 1] = 0.25   # center tap dx
    s = np.asarray(deform_sample(jnp.asarray(x), jnp.asarray(off)))
    # interior pixel (2, 2): sample at (2.5, 2.25) = 25 + 2.25
    np.testing.assert_allclose(s[0, 2, 2, 4, 0], 27.25, atol=1e-4)


def test_out_of_bounds_reads_zero():
    x = np.ones((1, 4, 4, 2), np.float32)
    off = np.zeros((1, 4, 4, 18), np.float32)
    off[..., 2 * 4 + 0] = 100.0   # push the center tap far off the map
    s = np.asarray(deform_sample(jnp.asarray(x), jnp.asarray(off)))
    assert float(np.abs(s[..., 4, :]).max()) == 0.0
    # corner tap (k=0, dy=dx=-1) at pixel (0, 0) is off-map with zero
    # offsets too
    off0 = np.zeros((1, 4, 4, 18), np.float32)
    s0 = np.asarray(deform_sample(jnp.asarray(x), jnp.asarray(off0)))
    assert float(np.abs(s0[0, 0, 0, 0]).max()) == 0.0
    assert float(s0[0, 1, 1, 0, 0]) == 1.0


def test_grouped_weights_route_channel_slices():
    rng = np.random.RandomState(1)
    x = rng.randn(1, 4, 4, 4).astype(np.float32)
    off = np.zeros((1, 4, 4, 18), np.float32)
    w = rng.randn(9, 2, 4).astype(np.float32)   # groups=2: Cin/2, Cout=4
    got = np.asarray(deform_conv2d(jnp.asarray(x), jnp.asarray(off),
                                   jnp.asarray(w), groups=2))
    # group 0 outputs (first 2 channels) depend only on input chans 0:2
    x2 = x.copy()
    x2[..., 2:] = 0.0
    got2 = np.asarray(deform_conv2d(jnp.asarray(x2), jnp.asarray(off),
                                    jnp.asarray(w), groups=2))
    np.testing.assert_allclose(got[..., :2], got2[..., :2], rtol=1e-4,
                               atol=1e-5)
    assert np.abs(got[..., 2:] - got2[..., 2:]).max() > 1e-3


def test_dcn_separate_head_forward_and_grads():
    from gga_tpu.models.dense_heads.centerpoint_head import (
        DCNSeparateHead)
    head = DCNSeparateHead(
        heads=dict(reg=(2, 2), height=(1, 2), heatmap=(3, 2)),
        num_cls=3, head_conv=8, dcn_groups=2)
    x = jnp.asarray(np.random.RandomState(2).randn(2, 8, 8, 8),
                    jnp.float32)
    vars_ = head.init(jax.random.PRNGKey(0), x, train=False)
    # zero-init offset conv: present and zero
    off_k = vars_['params']['feature_adapt_cls']['conv_offset']['kernel']
    assert float(jnp.abs(off_k).max()) == 0.0
    out, _ = head.apply(vars_, x, train=True,
                        mutable=['batch_stats'])
    assert out['heatmap'].shape == (2, 8, 8, 3)
    assert out['reg'].shape == (2, 8, 8, 2)

    def loss(p):
        o, _ = head.apply({'params': p,
                           'batch_stats': vars_['batch_stats']},
                          x, train=True, mutable=['batch_stats'])
        return sum(jnp.sum(v ** 2) for v in o.values())

    g = jax.grad(loss)(vars_['params'])
    leaves = jax.tree_util.tree_leaves(g)
    assert all(bool(jnp.all(jnp.isfinite(l))) for l in leaves)
    # the deformable kernel itself must receive gradient
    gk = g['feature_adapt_cls']['kernel']
    assert float(jnp.abs(gk).max()) > 0.0
