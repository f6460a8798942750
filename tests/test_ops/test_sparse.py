"""Sparse conv engine vs dense jax.lax conv ground truth."""
import jax
import jax.numpy as jnp
import numpy as np

from gga_tpu.ops import sparse as sp


def _random_sparse(rng, grid, n_active, n_budget, cin):
    nz, ny, nx = grid
    lin = rng.choice(nz * ny * nx, size=n_active, replace=False)
    lin = np.sort(lin)
    coords = np.stack([lin // (ny * nx), (lin // nx) % ny, lin % nx], -1)
    feats = rng.randn(n_active, cin).astype(np.float32)
    pad = n_budget - n_active
    coords = np.concatenate([coords, -np.ones((pad, 3), np.int64)])
    feats = np.concatenate([feats, np.zeros((pad, cin), np.float32)])
    valid = np.arange(n_budget) < n_active
    return sp.SparseTensor(
        features=jnp.asarray(feats), coords=jnp.asarray(coords, jnp.int32),
        valid=jnp.asarray(valid), grid=tuple(grid))


def _dense_conv(st, weights, kernel, stride, padding):
    """Ground truth: densify + lax.conv_general_dilated."""
    dense = np.asarray(sp.to_dense(st))  # [C, nz, ny, nx]
    kz, ky, kx = kernel
    w = np.asarray(weights).reshape(kz, ky, kx, weights.shape[-2],
                                    weights.shape[-1])
    out = jax.lax.conv_general_dilated(
        jnp.asarray(dense)[None], jnp.asarray(w),
        window_strides=stride,
        padding=[(p, p) for p in padding],
        dimension_numbers=('NCDHW', 'DHWIO', 'NCDHW'))
    return np.asarray(out)[0]  # [Cout, oz, oy, ox]


def test_subm_conv_matches_dense_at_active_sites():
    rng = np.random.RandomState(0)
    st = _random_sparse(rng, (6, 8, 8), 40, 64, 3)
    w = rng.randn(27, 3, 4).astype(np.float32) * 0.2
    out = sp.subm_conv(st, jnp.asarray(w))
    dense_out = _dense_conv(st, jnp.asarray(w), (3, 3, 3), (1, 1, 1),
                            (1, 1, 1))
    got = np.asarray(out.features)
    coords = np.asarray(st.coords)
    for i in range(40):
        z, y, x = coords[i]
        np.testing.assert_allclose(got[i], dense_out[:, z, y, x], atol=1e-4)
    # padding rows zero
    assert np.abs(got[40:]).max() == 0


def test_sparse_conv_stride2_matches_dense():
    rng = np.random.RandomState(1)
    st = _random_sparse(rng, (7, 9, 9), 30, 48, 2)
    w = rng.randn(27, 2, 5).astype(np.float32) * 0.3
    out = sp.sparse_conv(st, jnp.asarray(w), (3, 3, 3), (2, 2, 2),
                         (1, 1, 1), out_budget=64)
    dense_out = _dense_conv(st, jnp.asarray(w), (3, 3, 3), (2, 2, 2),
                            (1, 1, 1))
    assert out.grid == dense_out.shape[1:]
    oc = np.asarray(out.coords)
    ov = np.asarray(out.valid)
    got = np.asarray(out.features)
    assert ov.sum() > 0
    for i in np.where(ov)[0]:
        z, y, x = oc[i]
        np.testing.assert_allclose(got[i], dense_out[:, z, y, x], atol=1e-4)
    # completeness: every nonzero dense output site is in the active set
    active = {tuple(c) for c in oc[ov]}
    nz_sites = np.argwhere(np.abs(dense_out).sum(0) > 1e-5)
    for site in nz_sites:
        assert tuple(site) in active


def test_sparse_conv_asymmetric_kernel():
    """conv_out of SparseEncoder: kernel (3,1,1), stride (2,1,1), pad 0."""
    rng = np.random.RandomState(2)
    st = _random_sparse(rng, (5, 6, 6), 25, 32, 4)
    w = rng.randn(3, 4, 6).astype(np.float32) * 0.3
    out = sp.sparse_conv(st, jnp.asarray(w), (3, 1, 1), (2, 1, 1),
                         (0, 0, 0), out_budget=64)
    dense_out = _dense_conv(st, jnp.asarray(w), (3, 1, 1), (2, 1, 1),
                            (0, 0, 0))
    assert out.grid == dense_out.shape[1:]
    oc, ov = np.asarray(out.coords), np.asarray(out.valid)
    got = np.asarray(out.features)
    for i in np.where(ov)[0]:
        z, y, x = oc[i]
        np.testing.assert_allclose(got[i], dense_out[:, z, y, x], atol=1e-4)


def test_to_dense_roundtrip():
    rng = np.random.RandomState(3)
    st = _random_sparse(rng, (4, 4, 4), 10, 16, 2)
    dense = np.asarray(sp.to_dense(st))
    assert dense.shape == (2, 4, 4, 4)
    coords = np.asarray(st.coords)
    feats = np.asarray(st.features)
    for i in range(10):
        z, y, x = coords[i]
        np.testing.assert_allclose(dense[:, z, y, x], feats[i])
    assert np.count_nonzero(dense.sum(0)) <= 10


def test_out_budget_overflow_is_graceful():
    rng = np.random.RandomState(4)
    st = _random_sparse(rng, (6, 6, 6), 50, 64, 2)
    w = rng.randn(27, 2, 3).astype(np.float32)
    # tiny budget: must not crash; keeps the lowest-id sites
    out = sp.sparse_conv(st, jnp.asarray(w), (3, 3, 3), (2, 2, 2),
                         (1, 1, 1), out_budget=4)
    assert int(np.asarray(out.valid).sum()) == 4


def test_subm_custom_vjp_matches_autodiff():
    """The mirrored-gather backward must equal autodiff of the naive
    gather formulation (scatter-free backward)."""
    import jax

    rng = np.random.RandomState(7)
    grid = (6, 8, 8)
    lin = np.sort(rng.choice(6 * 8 * 8, 40, replace=False))
    coords = np.stack([lin // 64, (lin // 8) % 8, lin % 8], -1)
    coords = np.concatenate([coords, -np.ones((8, 3), np.int64)])
    feats = rng.randn(48, 5).astype(np.float32)
    feats[40:] = 0
    valid = np.arange(48) < 40
    st = sp.SparseTensor(jnp.asarray(feats),
                         jnp.asarray(coords, jnp.int32),
                         jnp.asarray(valid), grid)
    nmap, hit = sp.build_neighbor_map(st)
    w = jnp.asarray(rng.randn(27, 5, 4).astype(np.float32) * 0.3)
    ct = jnp.asarray(rng.randn(48, 4).astype(np.float32))

    def ref(f, w_):
        g = jnp.where(hit[..., None], f[nmap], 0.0)
        out = jnp.einsum('knc,kcd->nd', g, w_)
        return jnp.where(jnp.asarray(valid)[:, None], out, 0.0)

    f0 = jnp.asarray(feats)
    out_cv = sp.subm_conv_with_map(f0, jnp.asarray(valid), nmap, hit, w)
    np.testing.assert_allclose(np.asarray(out_cv), np.asarray(ref(f0, w)),
                               atol=1e-5)
    g_cv = jax.grad(lambda f, w_: (sp.subm_conv_with_map(
        f, jnp.asarray(valid), nmap, hit, w_) * ct).sum(),
        argnums=(0, 1))(f0, w)
    g_ref = jax.grad(lambda f, w_: (ref(f, w_) * ct).sum(),
                     argnums=(0, 1))(f0, w)
    np.testing.assert_allclose(np.asarray(g_cv[0]), np.asarray(g_ref[0]),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(g_cv[1]), np.asarray(g_ref[1]),
                               atol=1e-4)


def test_strided_custom_vjp_matches_autodiff():
    """sparse_conv_fast (reverse-gather backward) == sparse_conv grads."""
    import jax

    rng = np.random.RandomState(3)
    st = _random_sparse(rng, (7, 9, 9), 30, 48, 4)
    w = jnp.asarray(rng.randn(27, 4, 5).astype(np.float32) * 0.3)
    out_ref = sp.sparse_conv(st, w, (3, 3, 3), (2, 2, 2), (1, 1, 1), 64)
    out_fast = sp.sparse_conv_fast(st, w, (3, 3, 3), (2, 2, 2), (1, 1, 1),
                                   64)
    np.testing.assert_allclose(np.asarray(out_ref.features),
                               np.asarray(out_fast.features), atol=1e-5)
    ct = jnp.asarray(rng.randn(64, 5).astype(np.float32))

    def loss(f, w_, fn):
        o = fn(st.replace(features=f), w_, (3, 3, 3), (2, 2, 2),
               (1, 1, 1), 64)
        return (o.features * ct).sum()

    g_ref = jax.grad(loss, argnums=(0, 1))(st.features, w, sp.sparse_conv)
    g_fast = jax.grad(loss, argnums=(0, 1))(st.features, w,
                                            sp.sparse_conv_fast)
    np.testing.assert_allclose(np.asarray(g_ref[0]), np.asarray(g_fast[0]),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(g_ref[1]), np.asarray(g_fast[1]),
                               atol=1e-4)


def test_symmetric_nmap_matches_full_resolution():
    """build_neighbor_map resolves only half the offsets by sort and
    mirrors the rest (pos[k][n] = m <=> pos[K-1-k][m] = n); it must
    equal the direct all-offsets resolution, including ragged scenes."""
    for seed, (grid, n_rows, n_act) in enumerate(
            [((8, 16, 16), 120, 100), ((4, 7, 7), 50, 20)]):
        rng = np.random.RandomState(seed)
        lin = np.sort(rng.choice(np.prod(grid), n_act, replace=False))
        nz, ny, nx = grid
        cc = np.stack([lin // (ny * nx), (lin % (ny * nx)) // nx,
                       lin % nx], -1).astype(np.int32)
        cc = np.concatenate([cc, np.full((n_rows - n_act, 3), -1,
                                         np.int32)])
        vv = np.arange(n_rows) < n_act
        st = sp.SparseTensor(jnp.zeros((n_rows, 2)), jnp.asarray(cc),
                             jnp.asarray(vv), grid)
        for ksz, pad in (((3, 3, 3), (1, 1, 1)), ((3, 3, 1), (1, 1, 0))):
            pos, hit = sp.build_neighbor_map(st, ksz)
            pos0, hit0 = sp._neighbor_pos_hit(
                st, st.coords, st.valid, ksz, (1, 1, 1), pad)
            np.testing.assert_array_equal(np.asarray(hit),
                                          np.asarray(hit0))
            np.testing.assert_array_equal(
                np.where(np.asarray(hit), np.asarray(pos), -1),
                np.where(np.asarray(hit0), np.asarray(pos0), -1))


def test_bucket_ranks_match_merge_ranks():
    """_ranks_via_buckets must agree with _ranks_via_merge exactly
    (pos where hit, hit everywhere) for in-range queries, and miss for
    out-of-range ones — including bit-31 bucket positions, empty
    buckets, and invalid (parked) table rows."""
    rng = np.random.RandomState(7)
    for grid, n_act, n_rows in [((8, 16, 16), 100, 120),
                                ((4, 7, 7), 20, 50),
                                ((2, 3, 64), 64, 64)]:
        nz, ny, nx = grid
        total = nz * ny * nx
        lin = np.sort(rng.choice(total, n_act, replace=False))
        table = np.concatenate(
            [lin, np.full(n_rows - n_act, total)]).astype(np.int32)
        q = np.concatenate([
            rng.randint(-5, total + 5, size=300),
            lin[rng.randint(0, n_act, size=100)],  # guaranteed hits
            [0, total - 1, total, -1, 31, 32, 33, 1],
        ]).astype(np.int32).reshape(4, -1)
        pos_m, hit_m, _ = sp._ranks_via_merge(
            jnp.asarray(table), jnp.asarray(q))
        pos_b, hit_b = sp._ranks_via_buckets(
            jnp.asarray(table), np.int32(total), jnp.asarray(q))
        hit_m = np.asarray(hit_m) & (q >= 0) & (q < total)
        np.testing.assert_array_equal(np.asarray(hit_b), hit_m)
        np.testing.assert_array_equal(
            np.where(hit_m, np.asarray(pos_b), -1),
            np.where(hit_m, np.asarray(pos_m), -1))


def test_bucket_nmap_matches_sort_nmap(monkeypatch):
    """build_neighbor_map under GGA_NMAP_HASH must equal the sort-based
    resolution bit for bit."""
    monkeypatch.setattr(sp, 'NMAP_HASH', False)
    rng = np.random.RandomState(3)
    st = _random_sparse(rng, (6, 12, 32), 90, 128, 2)
    pos0, hit0 = sp.build_neighbor_map(st)
    monkeypatch.setattr(sp, 'NMAP_HASH', True)
    pos1, hit1 = sp.build_neighbor_map(st)
    np.testing.assert_array_equal(np.asarray(hit0), np.asarray(hit1))
    np.testing.assert_array_equal(
        np.where(np.asarray(hit0), np.asarray(pos0), -1),
        np.where(np.asarray(hit1), np.asarray(pos1), -1))


def test_merged_ranks_match_batched_merge():
    """_ranks_via_merge_single (one [T + K*Q] stream sort) must agree
    with the batched [K, T+Q] _ranks_via_merge on hits and hit
    positions, including duplicate queries and out-of-table values."""
    rng = np.random.RandomState(11)
    for _ in range(4):
        T = rng.randint(5, 300)
        K, Q = rng.randint(1, 15), rng.randint(5, 400)
        table = np.unique(rng.randint(0, 1000, T)).astype(np.int32)
        q = rng.randint(0, 1100, (K, Q)).astype(np.int32)
        q.reshape(-1)[rng.choice(q.size, q.size // 3)] = \
            rng.choice(table, q.size // 3)
        p1, h1, _ = sp._ranks_via_merge(jnp.asarray(table),
                                        jnp.asarray(q))
        p2, h2 = sp._ranks_via_merge_single(jnp.asarray(table),
                                            jnp.asarray(q))
        np.testing.assert_array_equal(np.asarray(h1), np.asarray(h2))
        np.testing.assert_array_equal(
            np.where(np.asarray(h1), np.asarray(p1), -1),
            np.where(np.asarray(h2), np.asarray(p2), -1))


def test_merged_nmap_matches_batched_nmap(monkeypatch):
    """build_neighbor_map under GGA_NMAP_MERGED must equal the batched
    merge resolution bit for bit."""
    monkeypatch.setattr(sp, 'NMAP_MERGED', False)
    rng = np.random.RandomState(5)
    st = _random_sparse(rng, (6, 12, 32), 90, 128, 2)
    pos0, hit0 = sp.build_neighbor_map(st)
    monkeypatch.setattr(sp, 'NMAP_MERGED', True)
    pos1, hit1 = sp.build_neighbor_map(st)
    np.testing.assert_array_equal(np.asarray(hit0), np.asarray(hit1))
    np.testing.assert_array_equal(
        np.where(np.asarray(hit0), np.asarray(pos0), -1),
        np.where(np.asarray(hit1), np.asarray(pos1), -1))


def test_full_merged_nmap_matches_symmetric(monkeypatch):
    """GGA_NMAP_FULL (direct 27-offset resolve) + GGA_NMAP_MERGED must
    equal the symmetric 13-resolve + mirror build bit for bit."""
    monkeypatch.setattr(sp, 'NMAP_MERGED', False)
    monkeypatch.setattr(sp, 'NMAP_FULL', False)
    rng = np.random.RandomState(7)
    st = _random_sparse(rng, (6, 12, 32), 90, 128, 2)
    pos0, hit0 = sp.build_neighbor_map(st)
    monkeypatch.setattr(sp, 'NMAP_MERGED', True)
    monkeypatch.setattr(sp, 'NMAP_FULL', True)
    pos1, hit1 = sp.build_neighbor_map(st)
    np.testing.assert_array_equal(np.asarray(hit0), np.asarray(hit1))
    np.testing.assert_array_equal(
        np.where(np.asarray(hit0), np.asarray(pos0), -1),
        np.where(np.asarray(hit1), np.asarray(pos1), -1))
