"""VoteFusion: lift 2D detections into per-seed image cues (ImVoteNet).

Rebuild of /root/reference/mmdet3d/models/fusion_layers/vote_fusion.py:13
fully vectorized on static shapes: every (seed, 2D-box) pair scores
in-box-membership + box confidence; the top ``max_imvote_per_pixel``
boxes per seed contribute cues —

- geometric (5): the 2D vote (box center - projected seed) lifted to a
  3D ray through the camera, expressed as the xz displacement at the
  seed's y plus the normalized ray direction;
- semantic (num_classes): one-hot class scaled by box confidence;
- texture (3): the normalized RGB pixel under the projected seed.

The reference's per-image python loop, dynamic bbox counts, and
append-zeros padding all become masked batched math ([B, S, K] pairs,
box validity masks).
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

EPS = 1e-6


@dataclasses.dataclass(frozen=True)
class VoteFusionConfig:
    num_classes: int = 10
    max_imvote_per_pixel: int = 3

    @property
    def cue_channels(self):
        return 5 + self.num_classes + 3


def vote_fusion(cfg: VoteFusionConfig, img, boxes_2d, boxes_valid,
                seeds_depth, seeds_valid, depth2img):
    """One sample.

    Args:
        img: [H, W, 3] raw image (0-255).
        boxes_2d: [Kb, 6] (x1, y1, x2, y2, conf, cls).
        boxes_valid: [Kb] bool.
        seeds_depth: [S, 3] seed xyz in DEPTH coords.
        seeds_valid: [S] bool.
        depth2img: [4, 4] projection.

    Returns:
        cues [S * K, 5 + C + 3], mask [S * K] bool — K copies per seed
        interleaved seed-major (seed s occupies rows s*K .. s*K+K-1).
    """
    H, W = img.shape[:2]
    S = seeds_depth.shape[0]
    K = cfg.max_imvote_per_pixel

    hom = jnp.concatenate([seeds_depth, jnp.ones((S, 1))], -1)
    uvz = (depth2img @ hom.T).T
    z = jnp.maximum(uvz[:, 2], EPS)
    uv = jnp.round(uvz[:, :2] / z[:, None] - 1)            # [S, 2]

    x1, y1, x2, y2, conf, cls = jnp.split(boxes_2d, 6, -1)  # [Kb, 1]
    mid = jnp.concatenate([(x1 + x2) / 2, (y1 + y2) / 2], -1)

    inbox = ((uv[:, None, 0] > x1[None, :, 0])
             & (uv[:, None, 0] < x2[None, :, 0])
             & (uv[:, None, 1] > y1[None, :, 0])
             & (uv[:, None, 1] < y2[None, :, 0])
             & boxes_valid[None, :] & seeds_valid[:, None])  # [S, Kb]

    # 2D vote -> 3D ray (vote_fusion.py:105-133)
    delta = mid[None, :, :] - uv[:, None, :]               # [S, Kb, 2]
    imvote_img = jnp.concatenate(
        [delta, jnp.zeros_like(delta[..., :1])], -1) * z[:, None, None]
    inv = jnp.linalg.inv(depth2img.T)
    imvote = jnp.einsum('skj,ji->ski', imvote_img,
                        inv[:3, :3])                        # [S, Kb, 3]
    ray = seeds_depth[:, None, :] + imvote
    ray = ray / jnp.sqrt((ray ** 2).sum(-1, keepdims=True) + EPS)
    xz = (ray[..., [0, 2]] / (ray[..., 1:2] + EPS)
          * seeds_depth[:, None, 1:2]
          - seeds_depth[:, None, [0, 2]])
    geo = jnp.concatenate([xz, ray], -1)                   # [S, Kb, 5]
    sem = jax.nn.one_hot(cls[:, 0].astype(jnp.int32),
                         cfg.num_classes) * conf           # [Kb, C]
    cues = jnp.concatenate(
        [geo, jnp.broadcast_to(sem[None], (S,) + sem.shape)], -1)
    cues = cues * inbox[..., None]

    # per-seed top-K pairs by (in-box + conf)
    pair = inbox.astype(jnp.float32) \
        + jnp.where(boxes_valid, conf[:, 0], 0.0)[None, :]
    score, idx = jax.lax.top_k(pair, K)                    # [S, K]
    cues = jnp.take_along_axis(cues, idx[..., None], axis=1)
    mask = jnp.take_along_axis(inbox, idx, axis=1)         # [S, K]

    # texture cue from the projected pixel (shared by the K slots)
    ui = jnp.clip(jnp.round(uv[:, 0]), 0, W - 1).astype(jnp.int32)
    vi = jnp.clip(jnp.round(uv[:, 1]), 0, H - 1).astype(jnp.int32)
    txt = img[vi, ui].astype(jnp.float32) / 255.0          # [S, 3]
    txt = jnp.broadcast_to(txt[:, None, :], (S, K, 3))

    out = jnp.concatenate([cues, txt], -1).reshape(S * K, -1)
    return out, mask.reshape(S * K)


def sample_valid_seeds(mask, num_sampled, rng):
    """imvotenet.sample_valid_seeds:14 — pick ``num_sampled`` entries
    favoring valid ones; when fewer are valid, remaining slots cycle
    through the valid set (static variant: rank valid-first with random
    tiebreak, then remap invalid-slot picks onto valid picks modulo the
    valid count)."""
    n = mask.shape[0]
    r = jax.random.uniform(rng, (n,))
    key = jnp.where(mask, r, 1.0 + r)
    order = jnp.argsort(key)                    # valid first
    n_valid = jnp.maximum(mask.sum(), 1)
    slots = jnp.arange(num_sampled)
    wrapped = jnp.where(slots < n_valid, slots, slots % n_valid)
    return order[wrapped]
