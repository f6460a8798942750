"""Three-way region-grow equivalence: C++ spatial-hash BFS vs the
vectorized numpy wave fallback vs a literal per-point BFS oracle
(the reference algorithm at
/root/reference/tools/data_converter/utils_gga.py:6).

Bounds the documented behavioral delta (gga_labels.py module docstring):
the wave version checks cluster purity once per frontier wave instead of
once per popped point, so it can only abort LATER. On scenes where no
abort triggers (pure clusters) all three paths must agree EXACTLY; on an
everywhere-impure cluster all three must abort; C++ and numpy-wave must
agree exactly always (same algorithm).
"""
import collections

import numpy as np
import pytest

from gga_tpu.data.kitti import gga_labels as gl
from gga_tpu.data.kitti.native import region_grow_native


def bfs_oracle(pc, mask_search, mask_origin, thresh, ratio=0.8):
    """Literal per-point BFS with per-pop purity abort (the reference
    semantics, reimplemented with indices instead of coordinates)."""
    search_idx = np.where(mask_search == 1)[0]
    pc_search = pc[search_idx]
    origin_in_search = mask_origin[search_idx] == 1
    mask = mask_origin.copy().astype(bool)
    best_len, best = 0, np.zeros(pc.shape[0])
    while mask.sum() > 0:
        seed_global = np.where(mask)[0][0]
        where = np.where(search_idx == seed_global)[0]
        if len(where) == 0:
            mask[seed_global] = False
            continue
        cluster = np.zeros(len(search_idx), bool)
        cluster[where[0]] = True
        queue = collections.deque([where[0]])
        flag = True
        while queue:
            cur = queue.popleft()
            d = np.linalg.norm(pc_search - pc_search[cur], axis=-1)
            new = (d < thresh) & ~cluster
            cluster |= new
            queue.extend(np.where(new)[0])
            purity = (cluster & origin_in_search).sum() / cluster.sum()
            if ratio is not None and purity < ratio:
                flag = False
                break
        if flag and cluster.sum() > best_len:
            best_len = cluster.sum()
            best = np.zeros(pc.shape[0])
            best[search_idx[cluster]] = 1
        drop = np.zeros(pc.shape[0], bool)
        drop[search_idx[cluster]] = True
        mask &= ~drop
    return best * mask_origin if ratio is not None else best


def numpy_wave(pc, mask_search, mask_origin, thresh, ratio):
    """Force the numpy fallback by disabling the native dispatch."""
    import unittest.mock as mock

    from gga_tpu.data.kitti import native
    with mock.patch.object(native, 'region_grow_native',
                           lambda *a, **k: None):
        return gl.region_grow(pc, mask_search, mask_origin, thresh,
                              ratio)


def _scene(rng):
    """Two dense pure clusters + scattered background."""
    c1 = rng.randn(60, 3) * 0.05 + np.array([0.0, 0.0, 10.0])
    c2 = rng.randn(40, 3) * 0.05 + np.array([3.0, 0.0, 12.0])
    bg = rng.uniform(-8, 8, (80, 3)) + np.array([0, 0, 20.0])
    pc = np.concatenate([c1, c2, bg]).astype(np.float64)
    mask_search = np.ones(len(pc))
    mask_origin = np.zeros(len(pc))
    mask_origin[:60] = 1          # origin = cluster 1
    return pc, mask_search, mask_origin


def test_three_way_exact_on_pure_clusters():
    rng = np.random.RandomState(0)
    pc, ms, mo = _scene(rng)
    for thresh in (0.3, 0.5):
        ref = bfs_oracle(pc, ms, mo, thresh, ratio=0.8)
        wave = numpy_wave(pc, ms, mo, thresh, ratio=0.8)
        np.testing.assert_array_equal(wave, ref)
        native = region_grow_native(pc, ms, mo, thresh, 0.8)
        if native is not None:
            np.testing.assert_array_equal(native, ref)


def test_three_way_abort_on_impure_cluster():
    """Origin covers only a sliver of one dense blob -> purity < ratio
    from the first wave on; every path must abort (empty result)."""
    rng = np.random.RandomState(1)
    blob = rng.randn(100, 3) * 0.05
    pc = blob.astype(np.float64)
    ms = np.ones(100)
    mo = np.zeros(100)
    mo[:5] = 1                     # 5% origin, ratio 0.8 unreachable
    ref = bfs_oracle(pc, ms, mo, 0.5, ratio=0.8)
    wave = numpy_wave(pc, ms, mo, 0.5, ratio=0.8)
    assert ref.sum() == 0
    assert wave.sum() == 0
    native = region_grow_native(pc, ms, mo, 0.5, 0.8)
    if native is not None:
        assert native.sum() == 0


def test_native_matches_wave_randomized():
    """C++ and numpy wave implement the same algorithm — exact match on
    random scenes (including ratio=None truncation-completion mode)."""
    native_probe = region_grow_native(
        np.zeros((4, 3)), np.ones(4), np.ones(4), 0.5, 0.8)
    if native_probe is None:
        pytest.skip('native kernel not built')
    rng = np.random.RandomState(2)
    for trial in range(5):
        n = 150
        pc = np.concatenate([
            rng.randn(50, 3) * rng.uniform(0.05, 0.3),
            rng.randn(50, 3) * 0.2 + rng.uniform(1, 4, 3),
            rng.uniform(-5, 5, (50, 3))]).astype(np.float64)
        ms = (rng.rand(n) > 0.2).astype(np.float64)
        mo = ((rng.rand(n) > 0.5) * ms).astype(np.float64)
        for ratio in (0.8, None):
            w = numpy_wave(pc, ms, mo, 0.4, ratio)
            nat = region_grow_native(pc, ms, mo, 0.4, ratio)
            np.testing.assert_array_equal(
                nat, w, err_msg=f'trial {trial} ratio {ratio}')
