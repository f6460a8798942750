"""Windowed one-hot Pallas gather == XLA gather (values, grads, fallback).

The kernel (ops/pallas/window_gather.py) is the engine's opt-in fast
path for the conv row gathers (GGA_WINDOW_GATHER=1); on the CPU test
mesh it runs in interpreter mode. These tests pin:
- exact values vs where(hit, F[nmap], 0) on monotone maps at every
  engine channel width, including sparse-hit and batch-flat maps;
- the XLA fallback when a block's hit span exceeds the aligned window;
- subm/rulebook convs produce identical outputs AND gradients with the
  flag on vs off.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gga_tpu.ops import sparse as sp
from gga_tpu.ops.pallas import window_gather as wg


def _ref(f, nmap, hit):
    g = np.where(hit.reshape(-1)[:, None],
                 np.asarray(f, np.float32)[np.maximum(nmap, 0).reshape(-1)],
                 0.0)
    return g.reshape(nmap.shape + (f.shape[-1],)).transpose(0, 2, 1)


def _monotone_map(K, Q, R, hit_rate, span_scale, seed):
    r = np.random.RandomState(seed)
    nmap = np.zeros((K, Q), np.int32)
    hit = r.rand(K, Q) < hit_rate
    for k in range(K):
        steps = r.exponential(span_scale * R / max(Q, 1), Q)
        nmap[k] = np.minimum(np.cumsum(steps), R - 1).astype(np.int32)
    return np.where(hit, nmap, 0), hit


@pytest.mark.parametrize('c', [16, 32, 64, 128])
def test_values_match_xla(c):
    rng = np.random.RandomState(c)
    R, K, Q = 4096, 5, 1000
    f = rng.randn(R, c).astype(np.float32)
    nmap, hit = _monotone_map(K, Q, R, 0.6, 1.0, seed=c)
    out = wg.window_gather_t(jnp.asarray(f), jnp.asarray(nmap),
                             jnp.asarray(hit))
    np.testing.assert_array_equal(np.asarray(out), _ref(f, nmap, hit))


def test_sparse_hits_and_bf16():
    rng = np.random.RandomState(0)
    R, K, Q = 16000, 27, 2000
    f32 = rng.randn(R, 16).astype(np.float32)
    f = jnp.asarray(f32, jnp.bfloat16)
    nmap, hit = _monotone_map(K, Q, R, 0.03, 1.0, seed=1)
    out = wg.window_gather_t(f, jnp.asarray(nmap), jnp.asarray(hit))
    exp = _ref(np.asarray(f, np.float32), nmap, hit)
    np.testing.assert_array_equal(np.asarray(out, np.float32), exp)


def test_span_overflow_falls_back_exactly():
    rng = np.random.RandomState(2)
    R = 4096
    # random (non-monotone) map: spans blow past any window
    nmap = np.sort(rng.randint(0, R, (3, 512)).astype(np.int32), axis=1)
    nmap[0, :10] = [0, R - 1] * 5  # worst-case span inside one block
    hit = rng.rand(3, 512) < 0.9
    f = rng.randn(R, 32).astype(np.float32)
    out = wg.window_gather_t(jnp.asarray(f), jnp.asarray(nmap),
                             jnp.asarray(hit))
    np.testing.assert_array_equal(np.asarray(out), _ref(f, nmap, hit))


def _random_st(rng, n_active, budget, c, grid=(8, 24, 32)):
    nz, ny, nx = grid
    lin = rng.choice(nz * ny * nx, n_active, replace=False)
    lin.sort()
    coords = np.stack([lin // (ny * nx), (lin // nx) % ny, lin % nx],
                      -1).astype(np.int32)
    coords = np.concatenate([coords,
                             np.zeros((budget - n_active, 3), np.int32)])
    valid = np.zeros(budget, bool)
    valid[:n_active] = True
    feats = rng.randn(budget, c).astype(np.float32) * valid[:, None]
    return sp.SparseTensor(jnp.asarray(feats), jnp.asarray(coords),
                           jnp.asarray(valid), grid)


def test_subm_conv_flag_equivalence(monkeypatch):
    rng = np.random.RandomState(3)
    st = _random_st(rng, 700, 768, 16)
    nmap, hit = sp.build_neighbor_map(st)
    w = jnp.asarray(rng.randn(27, 16, 16).astype(np.float32) * 0.1)

    def loss(feats, weights):
        out = sp.subm_conv_with_map(feats, st.valid, nmap, hit, weights)
        return (out * jnp.cos(out)).sum()

    monkeypatch.setattr(sp, 'WINDOW_GATHER', False)
    base = jax.value_and_grad(loss, argnums=(0, 1))(st.features, w)
    monkeypatch.setattr(sp, 'WINDOW_GATHER', True)
    fast = jax.value_and_grad(loss, argnums=(0, 1))(st.features, w)

    np.testing.assert_allclose(base[0], fast[0], rtol=1e-6)
    for a, b in zip(base[1], fast[1]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize('c,d', [(16, 16), (32, 64), (64, 64)])
def test_fused_conv_matches_einsum_path(c, d):
    """subm_conv_window (fused gather+GEMM kernel) == subm_conv_with_map
    in values and grads (f32-accumulation order differs, so allclose)."""
    rng = np.random.RandomState(c + d)
    st = _random_st(rng, 700, 768, c)
    nmap, hit = sp.build_neighbor_map(st)
    w = jnp.asarray(rng.randn(27, c, d).astype(np.float32) * 0.1)

    def loss(fn, feats, weights):
        out = fn(feats, st.valid, nmap, hit, weights)
        return (out * jnp.cos(out)).sum()

    import functools
    base = jax.value_and_grad(
        functools.partial(loss, sp.subm_conv_with_map),
        argnums=(0, 1))(st.features, w)
    fast = jax.value_and_grad(
        functools.partial(loss, sp.subm_conv_window),
        argnums=(0, 1))(st.features, w)
    np.testing.assert_allclose(base[0], fast[0], rtol=1e-5)
    for a, b in zip(base[1], fast[1]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_rulebook_conv_flag_equivalence(monkeypatch):
    rng = np.random.RandomState(4)
    st = _random_st(rng, 700, 768, 32)
    oc, ov, og, fm, bm = sp.downsample_rulebook(
        st, (3, 3, 3), (2, 2, 2), (1, 1, 1), 512)
    w = jnp.asarray(rng.randn(27, 32, 16).astype(np.float32) * 0.1)

    def loss(feats, weights):
        out = sp.rulebook_conv(feats, weights, fm, bm, ov)
        return (out * jnp.sin(out)).sum()

    monkeypatch.setattr(sp, 'WINDOW_GATHER', False)
    base = jax.value_and_grad(loss, argnums=(0, 1))(st.features, w)
    monkeypatch.setattr(sp, 'WINDOW_GATHER', True)
    fast = jax.value_and_grad(loss, argnums=(0, 1))(st.features, w)

    np.testing.assert_allclose(base[0], fast[0], rtol=1e-6)
    for a, b in zip(base[1], fast[1]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)
