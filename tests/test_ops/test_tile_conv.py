"""Tile-form submanifold conv == row-engine subm conv (fwd and grads)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gga_tpu.ops import sparse as sp
from gga_tpu.ops import tile_conv as tc


def make_scene(seed, n_active, n_budget, grid):
    r = np.random.RandomState(seed)
    nz, ny, nx = grid
    lin = np.sort(r.choice(nz * ny * nx, n_active, replace=False))
    coords = np.zeros((n_budget, 3), np.int32)
    coords[:n_active] = np.stack(
        [lin // (ny * nx), (lin % (ny * nx)) // nx, lin % nx], -1)
    coords[n_active:] = [nz - 1, ny - 1, nx - 1]
    valid = np.arange(n_budget) < n_active
    return jnp.asarray(coords), jnp.asarray(valid)


@pytest.mark.parametrize('tile', [(4, 4, 4), (2, 4, 4)])
def test_tile_subm_conv_matches_row_engine(tile):
    grid = (12, 24, 20)
    B, N, C, D = 2, 180, 6, 5
    T = 256
    rng = np.random.RandomState(0)
    coords, valids, feats = [], [], []
    for b in range(B):
        c, v = make_scene(b + 1, 150 - 17 * b, N, grid)
        coords.append(c)
        valids.append(v)
    coords = jnp.stack(coords)
    valids = jnp.stack(valids)
    feats = jnp.asarray(rng.randn(B, N, C), jnp.float32)
    feats = jnp.where(valids[..., None], feats, 0.0)
    w = jnp.asarray(rng.randn(27, C, D) * 0.2, jnp.float32)

    # row engine
    def row_one(f, c, v):
        st = sp.SparseTensor(f, c, v, grid)
        nmap, hit = sp.build_neighbor_map(st)
        return sp.subm_conv_with_map(f, v, nmap, hit, w)

    def row_loss(f):
        out = jax.vmap(row_one)(f, coords, valids)
        return (out ** 2).sum(), out

    (row_l, row_out), row_df = jax.value_and_grad(
        row_loss, has_aux=True)(feats)

    # tile engine
    tm = jax.vmap(lambda c, v: tc.build_tile_map(c, v, grid, tile, T))(
        coords, valids)
    tmf = tc.flatten_tile_map(tm)
    assert bool(tmf.kept.sum() == valids.sum()), 'tile budget overflow'

    def tile_loss(f):
        tiles = tc.rows_to_tiles(f.reshape(B * N, C), tmf)
        out_t = tc.tile_subm_conv(tiles, tmf.tnmap, tmf.thit,
                                  tmf.cell_mask, w)
        out = tc.tiles_to_rows(out_t, tmf.rank, tmf.slot, tmf.kept)
        out = out.reshape(B, N, D)
        return (out ** 2).sum(), out

    (tile_l, tile_out), tile_df = jax.value_and_grad(
        tile_loss, has_aux=True)(feats)

    np.testing.assert_allclose(np.asarray(tile_out), np.asarray(row_out),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(tile_df), np.asarray(row_df),
                               rtol=1e-4, atol=1e-4)


def test_tile_conv_weight_grads_match():
    grid = (8, 16, 16)
    N, C, D = 120, 4, 3
    c, v = make_scene(7, 100, N, grid)
    rng = np.random.RandomState(1)
    f = jnp.where(v[:, None],
                  jnp.asarray(rng.randn(N, C), jnp.float32), 0.0)
    w = jnp.asarray(rng.randn(27, C, D) * 0.3, jnp.float32)
    st = sp.SparseTensor(f, c, v, grid)
    nmap, hit = sp.build_neighbor_map(st)

    def row_loss(w_):
        return (sp.subm_conv_with_map(f, v, nmap, hit, w_) ** 2).sum()

    tm = tc.build_tile_map(c, v, grid, (4, 4, 4), 128)
    tmf = tc.flatten_tile_map(jax.tree_util.tree_map(
        lambda x: x[None] if hasattr(x, 'shape') else x, tm))

    def tile_loss(w_):
        tiles = tc.rows_to_tiles(f, tmf)
        out_t = tc.tile_subm_conv(tiles, tmf.tnmap, tmf.thit,
                                  tmf.cell_mask, w_)
        out = tc.tiles_to_rows(out_t, tmf.rank, tmf.slot, tmf.kept)
        return (out ** 2).sum()

    row_dw = jax.grad(row_loss)(w)
    tile_dw = jax.grad(tile_loss)(w)
    np.testing.assert_allclose(np.asarray(tile_dw), np.asarray(row_dw),
                               rtol=1e-4, atol=1e-4)


def test_cross_scene_isolation():
    """Perturbing scene 0's features must not change scene 1's output."""
    grid = (8, 16, 16)
    B, N, C, D = 2, 100, 4, 4
    coords = jnp.stack([make_scene(s + 3, 80, N, grid)[0]
                        for s in range(B)])
    valids = jnp.stack([make_scene(s + 3, 80, N, grid)[1]
                        for s in range(B)])
    rng = np.random.RandomState(2)
    f = jnp.where(valids[..., None],
                  jnp.asarray(rng.randn(B, N, C), jnp.float32), 0.0)
    w = jnp.asarray(rng.randn(27, C, D) * 0.3, jnp.float32)

    tm = jax.vmap(lambda c, v: tc.build_tile_map(c, v, grid,
                                                 (4, 4, 4), 128))(
        coords, valids)
    tmf = tc.flatten_tile_map(tm)

    def run(ff):
        tiles = tc.rows_to_tiles(ff.reshape(B * N, C), tmf)
        out_t = tc.tile_subm_conv(tiles, tmf.tnmap, tmf.thit,
                                  tmf.cell_mask, w)
        return tc.tiles_to_rows(out_t, tmf.rank, tmf.slot,
                                tmf.kept).reshape(B, N, D)

    base = run(f)
    pert = run(f.at[0].add(1.0))
    np.testing.assert_allclose(np.asarray(pert[1]), np.asarray(base[1]),
                               rtol=0, atol=0)
    assert not np.allclose(np.asarray(pert[0]), np.asarray(base[0]))


def test_encoder_tile_stages_match_row_engine():
    """SparseEncoder(tile_stages=(1,2,3)) == SparseEncoder(tile_stages=())
    with the SAME params (fwd and input grads): the engine choice is a
    pure implementation detail."""
    from gga_tpu.models.middle_encoders import SparseEncoder

    grid = (9, 32, 32)
    B, N = 2, 220
    rng = np.random.RandomState(5)
    coords, valids = [], []
    for b in range(B):
        c, v = make_scene(b + 11, 200 - 30 * b, N, grid)
        coords.append(c)
        valids.append(v)
    coords = jnp.stack(coords)
    valids = jnp.stack(valids)
    feats = jnp.where(valids[..., None],
                      jnp.asarray(rng.randn(B, N, 4), jnp.float32), 0.0)

    kw = dict(in_channels=4, sparse_shape=grid, base_channels=8,
              output_channels=8,
              encoder_channels=((8, 8), (8, 8), (8, 8), (8,)),
              encoder_paddings=((0, 1), (0, 1), (0, (0, 1, 1)), (0,)),
              stage_budgets=(N, N, N), out_budget=N)
    row_enc = SparseEncoder(**kw)
    tile_enc = SparseEncoder(**kw, tile_stages=(1, 2, 3),
                             tile_shape=(2, 4, 4),
                             tile_budgets=(0, 160, 96, 64))

    vars_row = row_enc.init(jax.random.PRNGKey(0), feats, coords, valids,
                            train=False)
    # identical param tree => the row init is directly usable
    vars_tile = tile_enc.init(jax.random.PRNGKey(0), feats, coords,
                              valids, train=False)
    jax.tree_util.tree_all(jax.tree_util.tree_map(
        lambda a, b: a.shape == b.shape, vars_row['params'],
        vars_tile['params']))

    def run(enc, f):
        out = enc.apply(vars_row, f, coords, valids, train=False)
        return (out ** 2).sum(), out

    (_, bev_row), df_row = jax.value_and_grad(
        lambda f: run(row_enc, f), has_aux=True)(feats)
    (_, bev_tile), df_tile = jax.value_and_grad(
        lambda f: run(tile_enc, f), has_aux=True)(feats)

    np.testing.assert_allclose(np.asarray(bev_tile), np.asarray(bev_row),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(df_tile), np.asarray(df_row),
                               rtol=2e-3, atol=2e-4)
