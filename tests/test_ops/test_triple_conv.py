"""x-triple subm conv == per-offset subm conv (fwd + grads), including
the center-missing-side-present alignment cases."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gga_tpu.ops import sparse as sp


def _random_st(rng, n_active, budget, grid=(8, 12, 16)):
    nz, ny, nx = grid
    # unique coords, sorted by linearized id, invalid parked at the end
    lin = rng.choice(nz * ny * nx, n_active, replace=False)
    lin.sort()
    coords = np.stack([lin // (ny * nx), (lin // nx) % ny, lin % nx],
                      -1).astype(np.int32)
    pad = np.zeros((budget - n_active, 3), np.int32)
    coords = np.concatenate([coords, pad])
    valid = np.zeros(budget, bool)
    valid[:n_active] = True
    feats = rng.randn(budget, 6).astype(np.float32) * valid[:, None]
    return sp.SparseTensor(jnp.asarray(feats), jnp.asarray(coords),
                           jnp.asarray(valid), grid)


def _line_st(xs, grid=(4, 4, 16)):
    """Actives along one x-row — exercises every present/absent pattern
    of the (t-1, t, t+1) candidates."""
    coords = np.array([[1, 1, x] for x in xs], np.int32)
    budget = len(xs) + 2
    pad = np.zeros((budget - len(xs), 3), np.int32)
    valid = np.zeros(budget, bool)
    valid[:len(xs)] = True
    feats = np.random.RandomState(0).randn(budget, 3).astype(np.float32)
    feats *= valid[:, None]
    return sp.SparseTensor(jnp.asarray(feats),
                           jnp.asarray(np.concatenate([coords, pad])),
                           jnp.asarray(valid), grid)


@pytest.mark.parametrize('xs', [
    (2, 3, 4),        # full triple
    (2, 4),           # center missing, both sides present (the trap)
    (2, 4, 6, 8),     # alternating
    (0, 15),          # grid-edge x cases
    (5,),             # isolated
])
def test_triple_matches_per_offset_line(xs):
    st = _line_st(xs)
    K, C, D = 27, st.features.shape[-1], 5
    w = jnp.asarray(np.random.RandomState(1).randn(K, C, D),
                    jnp.float32) * 0.1
    nmap, hit = sp.build_neighbor_map(st)
    ref = sp.subm_conv_with_map(st.features, st.valid, nmap, hit, w)
    anchor, sel = sp.build_triple_map(st)
    got = sp.subm_conv_triple(st.features, st.valid, anchor, sel, w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5)


def test_triple_matches_per_offset_random():
    rng = np.random.RandomState(0)
    st = _random_st(rng, n_active=300, budget=320)
    K, C, D = 27, st.features.shape[-1], 8
    w = jnp.asarray(rng.randn(K, C, D), jnp.float32) * 0.1
    nmap, hit = sp.build_neighbor_map(st)
    ref = sp.subm_conv_with_map(st.features, st.valid, nmap, hit, w)
    anchor, sel = sp.build_triple_map(st)
    got = sp.subm_conv_triple(st.features, st.valid, anchor, sel, w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5)

    # at most one kernel slot per gathered sub-row
    assert int(np.asarray(sel).sum(-1).max()) <= 1


def test_triple_grads_match():
    rng = np.random.RandomState(2)
    st = _random_st(rng, n_active=200, budget=220)
    K, C, D = 27, st.features.shape[-1], 4
    w = jnp.asarray(rng.randn(K, C, D), jnp.float32) * 0.1
    nmap, hit = sp.build_neighbor_map(st)
    anchor, sel = sp.build_triple_map(st)
    t = jnp.asarray(rng.randn(st.features.shape[0], D), jnp.float32)

    def loss_ref(f, w):
        out = sp.subm_conv_with_map(f, st.valid, nmap, hit, w)
        return jnp.sum((out - t) ** 2)

    def loss_tri(f, w):
        out = sp.subm_conv_triple(f, st.valid, anchor, sel, w)
        return jnp.sum((out - t) ** 2)

    (df_r, dw_r) = jax.grad(loss_ref, argnums=(0, 1))(st.features, w)
    (df_t, dw_t) = jax.grad(loss_tri, argnums=(0, 1))(st.features, w)
    np.testing.assert_allclose(np.asarray(df_t), np.asarray(df_r),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(dw_t), np.asarray(dw_r),
                               atol=1e-4)


def test_encoder_equivalent_under_triple_path(monkeypatch):
    """The full SparseEncoder (batched, flattened) produces identical
    outputs on the per-offset and x-triple paths."""
    from gga_tpu.models.middle_encoders import SparseEncoder

    rng = np.random.RandomState(3)
    B, V = 2, 128
    grid = (9, 16, 16)
    coords, valid, feats = [], [], []
    for _ in range(B):
        n = rng.randint(60, 100)
        lin = rng.choice(grid[0] * grid[1] * grid[2], n, replace=False)
        lin.sort()
        c = np.stack([lin // (grid[1] * grid[2]),
                      (lin // grid[2]) % grid[1],
                      lin % grid[2]], -1).astype(np.int32)
        c = np.concatenate([c, np.zeros((V - n, 3), np.int32)])
        v = np.zeros(V, bool)
        v[:n] = True
        coords.append(c)
        valid.append(v)
        feats.append(rng.randn(V, 4).astype(np.float32) * v[:, None])
    coords = jnp.asarray(np.stack(coords))
    valid = jnp.asarray(np.stack(valid))
    feats = jnp.asarray(np.stack(feats))

    enc = SparseEncoder(
        in_channels=4, base_channels=8, sparse_shape=grid,
        output_channels=8, encoder_channels=((8,), (8,), (8,), (8,)),
        encoder_paddings=((1,), (1,), (1,), (1,)),
        stage_budgets=(128, 128, 128), out_budget=128)

    import gga_tpu.ops.sparse as spm
    monkeypatch.setattr(spm, 'SUBM_TRIPLE', False)
    variables = enc.init(jax.random.PRNGKey(0), feats, coords, valid,
                         train=False)
    ref = enc.apply(variables, feats, coords, valid, train=False)

    monkeypatch.setattr(spm, 'SUBM_TRIPLE', True)
    v2 = enc.init(jax.random.PRNGKey(0), feats, coords, valid,
                  train=False)
    # identical param trees (same init RNG paths)
    for a, b in zip(jax.tree_util.tree_leaves(variables),
                    jax.tree_util.tree_leaves(v2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    got = enc.apply(variables, feats, coords, valid, train=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5)
