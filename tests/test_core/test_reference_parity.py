"""Golden parity checks against inline torch replicas of the reference's
geometry (the reference itself isn't importable — no mmcv — so the exact
formulas are transcribed from structures/utils.py and verified here)."""
import numpy as np
import pytest

torch = pytest.importorskip('torch')

import jax.numpy as jnp

from gga_tpu.core import geometry as g


def _torch_rotation_3d_in_axis(points, angles, axis=2, clockwise=False):
    """Verbatim transcription of structures/utils.py:29 (torch)."""
    points = torch.as_tensor(points)
    angles = torch.as_tensor(angles)
    rot_sin = torch.sin(angles)
    rot_cos = torch.cos(angles)
    ones = torch.ones_like(rot_cos)
    zeros = torch.zeros_like(rot_cos)
    if axis == 2:
        rot_mat_T = torch.stack([
            torch.stack([rot_cos, rot_sin, zeros]),
            torch.stack([-rot_sin, rot_cos, zeros]),
            torch.stack([zeros, zeros, ones])])
    elif axis == 1:
        rot_mat_T = torch.stack([
            torch.stack([rot_cos, zeros, -rot_sin]),
            torch.stack([zeros, ones, zeros]),
            torch.stack([rot_sin, zeros, rot_cos])])
    if clockwise:
        rot_mat_T = rot_mat_T.transpose(0, 1)
    return torch.einsum('aij,jka->aik', points, rot_mat_T)


def test_rotation_matches_reference_formula():
    rng = np.random.RandomState(0)
    pts = rng.randn(6, 5, 3).astype(np.float32)
    ang = rng.randn(6).astype(np.float32)
    for axis in (1, 2):
        for cw in (False, True):
            want = _torch_rotation_3d_in_axis(pts, ang, axis, cw).numpy()
            got = np.asarray(g.rotate_points(jnp.asarray(pts),
                                             jnp.asarray(ang), axis=axis,
                                             clockwise=cw))
            np.testing.assert_allclose(got, want, atol=1e-4)


def test_corner_order_matches_reference():
    """lidar_box3d.corners: unravel order reindexed [0,1,3,2,4,5,7,6],
    origin (0.5, 0.5, 0)."""
    dims = torch.tensor([[2.0, 4.0, 1.0]])
    corners_norm = torch.from_numpy(
        np.stack(np.unravel_index(np.arange(8), [2] * 3), axis=1)).to(
            dims.dtype)[[0, 1, 3, 2, 4, 5, 7, 6]]
    corners_norm = corners_norm - dims.new_tensor([0.5, 0.5, 0])
    want = (dims.view(-1, 1, 3) * corners_norm.reshape(1, 8, 3))
    ang = torch.tensor([0.37])
    want = _torch_rotation_3d_in_axis(want, ang, axis=2)
    want = want + torch.tensor([[1.0, -2.0, 0.5]]).view(-1, 1, 3)

    boxes = jnp.asarray([[1.0, -2.0, 0.5, 2.0, 4.0, 1.0, 0.37]])
    got = np.asarray(g.boxes7_to_corners(boxes))
    np.testing.assert_allclose(got, want.numpy(), atol=1e-4)
