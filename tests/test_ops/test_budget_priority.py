"""Budget-overflow truncation priority (round-5: replaces the
coordinate-order truncation that silently dropped the grid-corner tail
whenever a stage budget saturated — CLAUDE.md round-2 measurement).

With GGA_BUDGET_PRIORITY=dist (default) the sites kept under an
over-subscribed budget are the ones nearest the ego (BEV voxel
distance, x forward from 0, y centered); when the budget does NOT
saturate the result is bit-identical to the historical coordinate
order."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gga_tpu.ops import sparse as sp
from gga_tpu.ops.voxelize import hard_voxelize


def _grid_coords(lins, grid):
    oz, oy, ox = grid
    z = lins // (oy * ox)
    y = (lins % (oy * ox)) // ox
    x = lins % ox
    return np.stack([z, y, x], -1).astype(np.int32)


def test_budget_keep_prefers_near_sites():
    grid = (4, 64, 64)
    # sites along x at fixed (z=1, y=32): distances are x^2
    xs = np.arange(10, 50)
    lins = (1 * 64 * 64 + 32 * 64 + xs).astype(np.int32)
    keys = jnp.asarray(np.sort(lins))
    newv = jnp.ones((len(xs),), bool)
    big = jnp.int32(4 * 64 * 64)
    keep = sp._budget_keep(keys, newv, big, grid, 8)
    kept_x = xs[np.asarray(keep)]
    # the 8 NEAREST (smallest x) survive
    np.testing.assert_array_equal(kept_x, xs[:8])


def test_budget_keep_no_saturation_keeps_all():
    grid = (4, 64, 64)
    lins = np.sort(np.random.RandomState(0).choice(
        4 * 64 * 64, 20, replace=False)).astype(np.int32)
    keys = jnp.asarray(lins)
    newv = jnp.ones((20,), bool)
    keep = sp._budget_keep(keys, newv, jnp.int32(4 * 64 * 64), grid, 64)
    assert bool(np.asarray(keep).all())


def test_downsample_rulebook_saturated_keeps_near_field():
    if sp.BUDGET_PRIORITY != 'dist':
        pytest.skip('GGA_BUDGET_PRIORITY != dist')
    grid = (8, 128, 128)
    rng = np.random.RandomState(1)
    # two clusters: near (x in [4, 24]) and far (x in [100, 120])
    n_half = 128
    cn = np.stack([rng.randint(0, 8, n_half),
                   rng.randint(40, 80, n_half),
                   rng.randint(4, 24, n_half)], -1)
    cf = np.stack([rng.randint(0, 8, n_half),
                   rng.randint(40, 80, n_half),
                   rng.randint(100, 120, n_half)], -1)
    coords = np.concatenate([cn, cf]).astype(np.int32)
    lin = (coords[:, 0] * 128 * 128 + coords[:, 1] * 128 + coords[:, 2])
    order = np.argsort(lin)
    coords = np.unique(coords[order], axis=0)
    # re-sort by lin id (unique sorts lexicographically = lin order here)
    N = len(coords)
    budget = 64  # far fewer than the ~2x dilated output sites

    oc, ov, og, fm, bd, par = sp.downsample_rulebook_compact(
        jnp.asarray(coords)[None], jnp.ones((1, N), bool),
        grid, (3, 3, 3), (2, 2, 2), (1, 1, 1), budget)
    oc, ov = np.asarray(oc[0]), np.asarray(ov[0])
    assert ov.sum() == budget  # saturated
    kept_x = oc[ov][:, 2]
    # every kept site is from the near cluster's output region
    assert kept_x.max() < 30, f'far-field site kept: x={kept_x.max()}'
    # sorted-by-lin invariant preserved among kept sites
    og_ = og
    kl = (oc[ov][:, 0] * og_[1] * og_[2] + oc[ov][:, 1] * og_[2]
          + oc[ov][:, 2])
    assert (np.diff(kl) > 0).all()


def test_voxelizer_saturated_keeps_near_points():
    if sp.BUDGET_PRIORITY != 'dist':
        pytest.skip('GGA_BUDGET_PRIORITY != dist')
    rng = np.random.RandomState(2)
    # near shell (x<10) and far shell (x>60), distinct voxels
    near = np.stack([rng.uniform(2, 9, 300), rng.uniform(-30, 30, 300),
                     rng.uniform(-2, 0.5, 300)], -1)
    far = np.stack([rng.uniform(60, 70, 300), rng.uniform(-30, 30, 300),
                    rng.uniform(-2, 0.5, 300)], -1)
    pts = np.concatenate([near, far])
    pts = np.concatenate([pts, rng.rand(600, 1)], -1).astype(np.float32)
    out = jax.jit(lambda p, v: hard_voxelize(
        p, v, voxel_size=(0.4, 0.4, 0.5), pc_range=(0, -40, -3, 70.4, 40, 1),
        max_points=5, max_voxels=64))(pts, np.ones((600,), bool))
    nv = int(out['num_voxels'])
    assert nv == 64
    coords = np.asarray(out['coords'][:nv])   # (z, y, x-forward? no: zyx)
    # coords stored (z, y, x); x bin of near shell < 25
    assert coords[:, 2].max() < 30, coords[:, 2].max()