import jax.numpy as jnp
import numpy as np

from gga_tpu.ops.scatter import (assign_point_voxel_ids, dynamic_scatter_max,
                                 dynamic_scatter_mean, pillar_scatter)
from gga_tpu.ops.voxelize import dynamic_voxelize, hard_voxelize

VS = (0.5, 0.5, 0.5)
RANGE = (0.0, 0.0, 0.0, 4.0, 4.0, 2.0)


def _mk_points():
    pts = np.array([
        [0.1, 0.1, 0.1, 1.0],
        [0.2, 0.2, 0.2, 2.0],   # same voxel as point 0
        [1.1, 0.1, 0.1, 3.0],
        [3.9, 3.9, 1.9, 4.0],
        [9.0, 0.0, 0.0, 5.0],   # out of range
        [0.0, 0.0, 0.0, 0.0],   # padding row
    ], np.float32)
    valid = np.array([1, 1, 1, 1, 1, 0], bool)
    return jnp.asarray(pts), jnp.asarray(valid)


def test_hard_voxelize_basic():
    pts, valid = _mk_points()
    out = hard_voxelize(pts, valid, voxel_size=VS, pc_range=RANGE,
                        max_points=5, max_voxels=8)
    assert int(out['num_voxels']) == 3
    coords = np.asarray(out['coords'])
    nums = np.asarray(out['num_points'])
    vox = np.asarray(out['voxels'])
    # voxel (z,y,x) = (0,0,0) holds points 0 and 1
    assert coords[0].tolist() == [0, 0, 0]
    assert nums[0] == 2
    assert sorted(vox[0, :2, 3].tolist()) == [1.0, 2.0]
    # next voxels: (0,0,2) and (3,7,7)
    assert coords[1].tolist() == [0, 0, 2] and nums[1] == 1
    assert coords[2].tolist() == [3, 7, 7] and nums[2] == 1
    # padding voxels zeroed / -1
    assert nums[3:].sum() == 0 and (coords[3:] == -1).all()


def test_hard_voxelize_max_points_cap():
    pts = np.zeros((10, 4), np.float32)
    pts[:, :3] = 0.1
    pts[:, 3] = np.arange(10)
    out = hard_voxelize(jnp.asarray(pts), jnp.ones(10, bool),
                        voxel_size=VS, pc_range=RANGE, max_points=3,
                        max_voxels=4)
    assert int(out['num_voxels']) == 1
    assert int(out['num_points'][0]) == 3  # capped
    # first-come-first-served: keeps points 0, 1, 2
    np.testing.assert_allclose(np.asarray(out['voxels'])[0, :, 3], [0, 1, 2])


def test_hard_voxelize_max_voxels_cap():
    rng = np.random.RandomState(0)
    pts = np.concatenate([rng.uniform(0, 4, (100, 2)),
                          rng.uniform(0, 2, (100, 1)),
                          rng.randn(100, 1)], 1).astype(np.float32)
    out = hard_voxelize(jnp.asarray(pts), jnp.ones(100, bool),
                        voxel_size=VS, pc_range=RANGE, max_points=5,
                        max_voxels=4)
    assert int(out['num_voxels']) == 4
    assert (np.asarray(out['coords'])[:4] >= 0).all()


def test_coords_sorted_invariant():
    rng = np.random.RandomState(1)
    pts = np.concatenate([rng.uniform(0, 4, (50, 2)),
                          rng.uniform(0, 2, (50, 1)),
                          rng.randn(50, 1)], 1).astype(np.float32)
    out = hard_voxelize(jnp.asarray(pts), jnp.ones(50, bool),
                        voxel_size=VS, pc_range=RANGE, max_points=5,
                        max_voxels=64)
    n = int(out['num_voxels'])
    c = np.asarray(out['coords'])[:n].astype(np.int64)
    lin = c[:, 0] * 64 + c[:, 1] * 8 + c[:, 2]
    assert (np.diff(lin) > 0).all()  # strictly increasing = sorted unique


def test_dynamic_voxelize_and_scatter():
    pts, valid = _mk_points()
    coords, ok = dynamic_voxelize(pts, valid, voxel_size=VS, pc_range=RANGE)
    coords = np.asarray(coords)
    assert coords[0].tolist() == [0, 0, 0]
    assert coords[4].tolist() == [-1, -1, -1]  # out of range
    assert coords[5].tolist() == [-1, -1, -1]  # padding

    hv = hard_voxelize(pts, valid, voxel_size=VS, pc_range=RANGE,
                       max_points=5, max_voxels=8)
    ids = assign_point_voxel_ids(jnp.asarray(coords), hv['coords'],
                                 jnp.asarray(ok), hv['coords'][:, 0] >= 0,
                                 (4, 8, 8))
    ids = np.asarray(ids)
    assert ids[0] == 0 and ids[1] == 0 and ids[2] == 1 and ids[3] == 2
    assert ids[4] == 8 and ids[5] == 8  # misses park at V

    mean, cnt = dynamic_scatter_mean(pts, jnp.asarray(ids), jnp.asarray(ok),
                                     8)
    np.testing.assert_allclose(np.asarray(mean)[0, 3], 1.5, atol=1e-6)
    assert np.asarray(cnt)[:3].tolist() == [2, 1, 1]
    mx, _ = dynamic_scatter_max(pts, jnp.asarray(ids), jnp.asarray(ok), 8)
    np.testing.assert_allclose(np.asarray(mx)[0, 3], 2.0, atol=1e-6)


def test_pillar_scatter():
    feats = jnp.asarray(np.arange(6, dtype=np.float32).reshape(3, 2))
    coords = jnp.asarray(np.array([[0, 1, 2], [0, 0, 0], [0, 3, 4]]))
    valid = jnp.asarray(np.array([True, True, False]))
    canvas = np.asarray(pillar_scatter(feats, coords, valid, (4, 5)))
    assert canvas.shape == (2, 4, 5)
    np.testing.assert_allclose(canvas[:, 1, 2], [0, 1])
    np.testing.assert_allclose(canvas[:, 0, 0], [2, 3])
    np.testing.assert_allclose(canvas[:, 3, 4], [0, 0])  # invalid dropped
