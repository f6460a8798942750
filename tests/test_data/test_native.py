"""Native region-grow kernel vs the numpy reference implementation."""
import numpy as np
import pytest

from gga_tpu.data.kitti import gga_labels
from gga_tpu.data.kitti.native import available, region_grow_native


def _numpy_region_grow(pc, ms, mo, thresh, ratio):
    """Call the module's numpy fallback directly (bypass dispatch)."""
    import unittest.mock as mock
    with mock.patch('gga_tpu.data.kitti.native.region_grow_native',
                    return_value=None):
        return gga_labels.region_grow(pc, ms, mo, thresh, ratio)


@pytest.mark.skipif(not available(), reason='native lib not built')
def test_native_matches_numpy():
    rng = np.random.RandomState(3)
    a = rng.randn(400, 3) * 0.2
    b = rng.randn(300, 3) * 0.2 + np.array([8.0, 0, 0])
    noise = rng.uniform(-10, 10, (100, 3))
    pc = np.concatenate([a, b, noise])
    n = len(pc)
    search = np.ones(n)
    origin = np.zeros(n)
    origin[:400] = 1
    for thresh in (0.3, 0.5):
        got = region_grow_native(pc, search, origin, thresh, 0.8)
        want = _numpy_region_grow(pc, search, origin, thresh, 0.8)
        np.testing.assert_array_equal(got, want)
    # truncation-completion mode (ratio=None)
    o2 = np.zeros(n)
    o2[:30] = 1
    got = region_grow_native(pc, search, o2, 0.5, None)
    want = _numpy_region_grow(pc, search, o2, 0.5, None)
    np.testing.assert_array_equal(got, want)


@pytest.mark.skipif(not available(), reason='native lib not built')
def test_native_purity_abort():
    # two touching clusters: growing from the pure one leaks into the
    # impure region and must abort, leaving no valid cluster with a high
    # purity requirement unless separated
    rng = np.random.RandomState(4)
    a = rng.randn(100, 3) * 0.1
    b = rng.randn(200, 3) * 0.1 + np.array([0.15, 0, 0])  # overlapping
    pc = np.concatenate([a, b])
    search = np.ones(300)
    origin = np.zeros(300)
    origin[:100] = 1
    out = region_grow_native(pc, search, origin, 0.5, 0.99)
    want = _numpy_region_grow(pc, search, origin, 0.5, 0.99)
    # both must agree that the cluster is rejected (or accept the same)
    assert (out.sum() == 0) == (want.sum() == 0)
