"""Point-cloud ops: FPS, kNN, ball query, three-NN interpolation, grouping.

TPU-native replacements for the mmcv CUDA point ops consumed by the
reference's PointNet++/VoteNet/PointRCNN families
(/root/reference/mmdet3d/ops/__init__.py:5-20): all static-shape jnp —
distance matrices ride the MXU, selection is top-k/scan.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

BIG = 1e10


def square_distance(a, b, a_valid=None, b_valid=None):
    """[N, 3] x [M, 3] -> [N, M] squared euclidean distances (masked
    entries pushed to BIG)."""
    d = (jnp.sum(a ** 2, -1)[:, None] + jnp.sum(b ** 2, -1)[None, :]
         - 2 * jnp.einsum('nd,md->nm', a, b,
                          precision=jax.lax.Precision.HIGHEST))
    d = jnp.maximum(d, 0.0)
    if a_valid is not None:
        d = jnp.where(a_valid[:, None], d, BIG)
    if b_valid is not None:
        d = jnp.where(b_valid[None, :], d, BIG)
    return d


@functools.partial(jax.jit, static_argnames=('num_samples',))
def furthest_point_sample(points, valid, num_samples):
    """Iterative farthest point sampling (mmcv furthest_point_sample).

    Args:
        points: [P, 3]; valid: [P] bool.

    Returns:
        [num_samples] int32 indices (repeats when fewer valid points).
    """
    P = points.shape[0]
    start = jnp.argmax(valid)          # first valid point

    def body(i, state):
        idxs, min_d = state
        last = points[idxs[i - 1]]
        d = jnp.sum((points - last) ** 2, -1)
        d = jnp.where(valid, d, -1.0)
        min_d = jnp.minimum(min_d, d)
        idxs = idxs.at[i].set(jnp.argmax(min_d))
        return idxs, min_d

    idxs0 = jnp.zeros((num_samples,), jnp.int32).at[0].set(start)
    min_d0 = jnp.where(valid, BIG, -1.0)
    idxs, _ = jax.lax.fori_loop(1, num_samples, body, (idxs0, min_d0))
    return idxs


def knn(query, support, k, q_valid=None, s_valid=None):
    """k nearest neighbors: -> (indices [Q, k], sq distances [Q, k])."""
    d = square_distance(query, support, q_valid, s_valid)
    neg_d, idx = jax.lax.top_k(-d, k)
    return idx, -neg_d


def ball_query(query, support, radius, num_samples, q_valid=None,
               s_valid=None):
    """Up to num_samples support indices within radius of each query
    (mmcv ball_query semantics: first-found order, slots padded with the
    first hit; all-miss rows return index 0 with count 0).

    Returns:
        (indices [Q, S], counts [Q]).
    """
    d = square_distance(query, support, q_valid, s_valid)
    hit = d < radius ** 2                              # [Q, P]
    rank = jnp.cumsum(hit, axis=-1) - 1                # per-row hit rank
    P = support.shape[0]
    cols = jnp.arange(P)[None, :]
    slot = jnp.where(hit & (rank < num_samples), rank, num_samples)
    out = jnp.full((query.shape[0], num_samples + 1), -1, jnp.int32)
    out = jax.vmap(lambda o, s: o.at[s].set(cols[0]))(out, slot)
    out = out[:, :num_samples]
    counts = jnp.minimum(hit.sum(-1), num_samples)
    first = jnp.where(out[:, 0] >= 0, out[:, 0], 0)
    out = jnp.where(out >= 0, out, first[:, None])
    return out, counts


def gather_points(points, idx):
    """[P, C] gathered at [S] -> [S, C] (mmcv gather_points)."""
    return points[idx]


def group_points(points, idx):
    """[P, C] gathered at [Q, S] -> [Q, S, C] (mmcv grouping_operation)."""
    return points[idx]


def three_nn(query, support, s_valid=None):
    """3 nearest supports per query -> (sq dists [Q, 3], idx [Q, 3])."""
    idx, d = knn(query, support, 3, s_valid=s_valid)
    return d, idx


def three_interpolate(features, idx, dist2, eps=1e-8):
    """Inverse-distance weighted interpolation (mmcv three_interpolate).

    Args:
        features: [P, C] support features.
        idx: [Q, 3]; dist2: [Q, 3] squared distances.

    Returns:
        [Q, C].
    """
    w = 1.0 / jnp.maximum(dist2, eps)
    w = w / w.sum(-1, keepdims=True)
    return jnp.einsum('qs,qsc->qc', w, features[idx],
                      precision=jax.lax.Precision.HIGHEST)


def query_and_group(points, features, centers, radius, num_samples,
                    p_valid=None, use_xyz=True):
    """QueryAndGroup (mmcv): ball query + relative-xyz concat grouping.

    Returns:
        ([Q, S, C(+3)] grouped features, [Q, S] in-ball mask).
    """
    idx, counts = ball_query(centers, points, radius, num_samples,
                             s_valid=p_valid)
    grouped_xyz = points[idx] - centers[:, None, :]
    mask = jnp.arange(num_samples)[None, :] < counts[:, None]
    if features is None:
        out = grouped_xyz
    elif use_xyz:
        out = jnp.concatenate([grouped_xyz, features[idx]], -1)
    else:
        out = features[idx]
    return jnp.where(mask[..., None], out, 0.0), mask
