"""Batch-flattened sparse convs must equal the per-scene vmapped path.

The modules in models/layers.py run their gather+GEMMs on [B*N, C] with
row-offset maps (vmapped gathers are ~4x slower on TPU); this pins the
flattening to the straightforward vmap semantics, including invalid
rows, bias, and gradients through the custom VJPs.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gga_tpu.models.layers import (SparseConv3d, SubMConv3dMapped,
                                   flatten_nmap, flatten_rulebook)
from gga_tpu.ops import sparse as sp

GRID = (8, 16, 16)
N = 120
B = 3


@pytest.fixture(scope='module')
def scenes():
    rng = np.random.RandomState(0)
    coords, valids = [], []
    for b in range(B):
        n_act = [100, 120, 77][b]
        lin = np.sort(rng.choice(np.prod(GRID), n_act, replace=False))
        cc = np.stack([lin // (16 * 16), (lin % (16 * 16)) // 16,
                       lin % 16], -1).astype(np.int32)
        cc = np.concatenate(
            [cc, np.full((N - n_act, 3), -1, np.int32)])
        coords.append(cc)
        valids.append(np.arange(N) < n_act)
    feats = rng.randn(B, N, 6).astype(np.float32)
    return (jnp.asarray(feats), jnp.asarray(np.stack(coords)),
            jnp.asarray(np.stack(valids)))


def test_subm_flat_equals_vmap(scenes):
    feats, coords, valid = scenes

    def mk(c, v):
        st = sp.SparseTensor(jnp.zeros((N, 1), jnp.float32), c, v, GRID)
        return sp.build_neighbor_map(st)

    nmap, hit = jax.vmap(mk)(coords, valid)
    mod = SubMConv3dMapped(10)
    vars_ = mod.init(jax.random.PRNGKey(0), feats, valid, nmap, hit)
    w = vars_['params']['kernel']

    out_flat = mod.apply(vars_, feats, valid, nmap, hit)
    out_vmap = jax.vmap(lambda f, v, m, h: sp.subm_conv_with_map(
        f, v, m, h, w))(feats, valid, nmap, hit)
    np.testing.assert_array_equal(np.asarray(out_flat),
                                  np.asarray(out_vmap))

    # gradients through the custom VJP agree too
    g_flat = jax.grad(lambda f: (mod.apply(
        vars_, f, valid, nmap, hit) ** 2).sum())(feats)
    g_vmap = jax.grad(lambda f: (jax.vmap(
        lambda ff, v, m, h: sp.subm_conv_with_map(ff, v, m, h, w))(
        f, valid, nmap, hit) ** 2).sum())(feats)
    np.testing.assert_allclose(np.asarray(g_flat), np.asarray(g_vmap),
                               rtol=1e-5, atol=1e-5)


def test_strided_flat_equals_vmap(scenes):
    feats, coords, valid = scenes
    mod = SparseConv3d(12, (3, 3, 3), (2, 2, 2), (1, 1, 1),
                       out_budget=N)
    vars_ = mod.init(jax.random.PRNGKey(1), feats, coords, valid, GRID)
    w = vars_['params']['kernel']

    of, oc, ov, og = mod.apply(vars_, feats, coords, valid, GRID)

    def one(f, c, v):
        st = sp.SparseTensor(f, c, v, GRID)
        o = sp.sparse_conv_fast(st, w, (3, 3, 3), (2, 2, 2), (1, 1, 1),
                                N)
        return o.features, o.coords, o.valid

    of2, oc2, ov2 = jax.vmap(one)(feats, coords, valid)
    np.testing.assert_array_equal(np.asarray(oc), np.asarray(oc2))
    np.testing.assert_array_equal(np.asarray(ov), np.asarray(ov2))
    np.testing.assert_array_equal(np.asarray(of), np.asarray(of2))

    g1 = jax.grad(lambda f: (mod.apply(
        vars_, f, coords, valid, GRID)[0] ** 2).sum())(feats)
    g2 = jax.grad(lambda f: (jax.vmap(one)(f, coords, valid)[0]
                             ** 2).sum())(feats)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize('ks,stride,pad', [
    ((3, 3, 3), (2, 2, 2), (1, 1, 1)),
    ((3, 1, 1), (2, 1, 1), (0, 0, 0)),   # SECOND's conv_out z-compress
])
def test_batched_rulebook_equals_vmapped(scenes, ks, stride, pad):
    """downsample_rulebook_batched (flat scatters) must emit bit-identical
    coords/valid/maps to the per-scene rulebook + flatten_rulebook."""
    _, coords, valid = scenes
    bud = 90

    def one(c, v):
        st = sp.SparseTensor(jnp.zeros((N, 1), jnp.float32), c, v, GRID)
        return sp.downsample_rulebook(st, ks, stride, pad, bud)

    oc, ov, og, fm, bm = jax.vmap(
        one, out_axes=(0, 0, None, 0, 0))(coords, valid)
    fm_f, bm_f = flatten_rulebook(fm, bm, N)
    oc2, ov2, og2, fm2, bm2 = sp.downsample_rulebook_batched(
        coords, valid, GRID, ks, stride, pad, bud)
    assert og == og2
    np.testing.assert_array_equal(np.asarray(oc), np.asarray(oc2))
    np.testing.assert_array_equal(np.asarray(ov), np.asarray(ov2))
    np.testing.assert_array_equal(np.asarray(fm_f), np.asarray(fm2))
    np.testing.assert_array_equal(np.asarray(bm_f), np.asarray(bm2))


@pytest.mark.parametrize('ks,stride,pad', [
    ((3, 3, 3), (2, 2, 2), (1, 1, 1)),
    ((3, 1, 1), (2, 1, 1), (0, 0, 0)),
])
def test_compact_bwd_rulebook_matches_dense(scenes, ks, stride, pad):
    """The compact-backward strided conv (GGA_RB_COMPACT_BWD path) must
    match the dense-map conv exactly in the forward and to fp tolerance
    in both gradients."""
    feats, coords, valid = scenes
    bud = 90
    B, N_, C = feats.shape
    rng = np.random.RandomState(3)
    K = int(np.prod(ks))
    w = jnp.asarray(rng.randn(K, C, 5).astype(np.float32) * 0.2)

    oc, ov, og, fm, bm = sp.downsample_rulebook_batched(
        coords, valid, GRID, ks, stride, pad, bud)
    oc2, ov2, og2, fm2, bd, par = sp.downsample_rulebook_compact(
        coords, valid, GRID, ks, stride, pad, bud)
    np.testing.assert_array_equal(np.asarray(oc), np.asarray(oc2))
    np.testing.assert_array_equal(np.asarray(ov), np.asarray(ov2))
    np.testing.assert_array_equal(np.asarray(fm), np.asarray(fm2))

    ff = feats.reshape(B * N_, C)
    ovf = ov.reshape(-1)

    def dense(f, ww):
        return sp.rulebook_conv(f, ww, fm, bm, ovf)

    def compact(f, ww):
        return sp.rulebook_conv_compact(f, ww, fm2, bd, par, ovf,
                                        ks, stride)

    np.testing.assert_allclose(np.asarray(dense(ff, w)),
                               np.asarray(compact(ff, w)),
                               rtol=1e-5, atol=1e-5)
    g1 = jax.grad(lambda f, ww: (dense(f, ww) ** 2).sum(),
                  argnums=(0, 1))(ff, w)
    g2 = jax.grad(lambda f, ww: (compact(f, ww) ** 2).sum(),
                  argnums=(0, 1))(ff, w)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize('ks,stride,pad', [
    ((3, 3, 3), (2, 2, 2), (1, 1, 1)),
    ((3, 1, 1), (2, 1, 1), (0, 0, 0)),
])
def test_pairmajor_strided_matches_dense(scenes, ks, stride, pad):
    """The pair-major strided conv (GGA_STRIDED_PAIRMAJOR path: no fwd
    map, forward = parity einsum + one scatter-add) must produce the
    same outputs/coords as the dense path and matching gradients; its
    bwd_d/parity maps must be bit-identical to the compact build's, and
    the scatter-built bwd_d (GGA_RB_RANKS=scatter) must be bit-identical
    to the merge-ranked one."""
    feats, coords, valid = scenes
    bud = 90
    B, N_, C = feats.shape
    rng = np.random.RandomState(4)
    K = int(np.prod(ks))
    w = jnp.asarray(rng.randn(K, C, 5).astype(np.float32) * 0.2)

    oc, ov, og, fm, bm = sp.downsample_rulebook_batched(
        coords, valid, GRID, ks, stride, pad, bud)
    occ, ovc, ogc, fmc, bd_m, par_m = sp.downsample_rulebook_compact(
        coords, valid, GRID, ks, stride, pad, bud)
    old = sp.RB_RANKS
    try:
        sp.RB_RANKS = 'scatter'
        _, _, _, _, bd_s, par_s = sp.downsample_rulebook_compact(
            coords, valid, GRID, ks, stride, pad, bud)
    finally:
        sp.RB_RANKS = old
    np.testing.assert_array_equal(np.asarray(bd_m), np.asarray(bd_s))
    np.testing.assert_array_equal(np.asarray(par_m), np.asarray(par_s))

    oc3, ov3, og3, bd3, par3 = sp.downsample_rulebook_pairmajor(
        coords, valid, GRID, ks, stride, pad, bud)
    assert og3 == og
    np.testing.assert_array_equal(np.asarray(oc), np.asarray(oc3))
    np.testing.assert_array_equal(np.asarray(ov), np.asarray(ov3))
    np.testing.assert_array_equal(np.asarray(bd_m), np.asarray(bd3))
    np.testing.assert_array_equal(np.asarray(par_m), np.asarray(par3))

    ff = feats.reshape(B * N_, C)
    ovf = ov.reshape(-1)

    def dense(f, ww):
        return sp.rulebook_conv(f, ww, fm, bm, ovf)

    def pm(f, ww):
        return sp.rulebook_conv_pairmajor(f, ww, bd3, par3, ovf,
                                          ks, stride)

    np.testing.assert_allclose(np.asarray(dense(ff, w)),
                               np.asarray(pm(ff, w)),
                               rtol=1e-5, atol=1e-5)
    g1 = jax.grad(lambda f, ww: (dense(f, ww) ** 2).sum(),
                  argnums=(0, 1))(ff, w)
    g2 = jax.grad(lambda f, ww: (pm(f, ww) ** 2).sum(),
                  argnums=(0, 1))(ff, w)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_flat_helpers_preserve_misses():
    nmap = jnp.asarray(np.array([[[0, 1], [1, 0]]] * 2))   # [B=2,K=2,N=2]
    hit = jnp.asarray(np.array([[[True, False], [True, True]]] * 2))
    nf, hf = flatten_nmap(nmap, hit)
    assert nf.shape == (2, 4) and hf.shape == (2, 4)
    # scene 1 rows offset by N=2
    np.testing.assert_array_equal(np.asarray(nf[0]), [0, 1, 2, 3])

    fwd = jnp.asarray(np.array([[[1, -1]], [[0, -1]]]))    # [B=2,K=1,M=2]
    bwd = jnp.asarray(np.array([[[-1, 0]], [[1, -1]]]))    # [B=2,K=1,N=2]
    ff, bf = flatten_rulebook(fwd, bwd, 2)
    np.testing.assert_array_equal(np.asarray(ff[0]), [1, -1, 2, -1])
    np.testing.assert_array_equal(np.asarray(bf[0]), [-1, 0, 3, -1])


def test_flatten_nmap_n_in_differs_from_map_width():
    # map of M=2 query rows into n_in=5 input rows per scene: scene 1's
    # rows must offset by 5, not by the map width 2
    nmap = jnp.asarray(np.array([[[3, 4]], [[0, 2]]]))     # [B=2,K=1,M=2]
    hit = jnp.ones((2, 1, 2), bool)
    nf, _ = flatten_nmap(nmap, hit, n_in=5)
    np.testing.assert_array_equal(np.asarray(nf[0]), [3, 4, 5, 7])


def test_mink_block_stride2_scene_isolation(scenes):
    """Stride-2 MinkBasicBlock with out_budget != N: perturbing scene 0's
    features must not change scene 1's output (the ADVICE-r2 high bug:
    the 1x1 identity projection flattened its gather map with the
    output-set width instead of the input row count)."""
    from gga_tpu.models.backbones.mink_resnet import MinkBasicBlock
    feats, coords, valid = scenes
    mod = MinkBasicBlock(8, stride=2, out_budget=N // 2)
    vars_ = mod.init(jax.random.PRNGKey(2), feats, coords, valid, GRID,
                     False)

    out0 = mod.apply(vars_, feats, coords, valid, GRID, False)[0]
    bumped = feats.at[0].add(100.0)
    out1 = mod.apply(vars_, bumped, coords, valid, GRID, False)[0]
    delta_other = np.abs(np.asarray(out1[1:]) - np.asarray(out0[1:]))
    assert delta_other.max() == 0.0
    # and scene 0 did change (the perturbation reaches the output)
    assert np.abs(np.asarray(out1[0]) - np.asarray(out0[0])).max() > 0
