"""Box coders.

Jittable rebuild of DeltaXYZWLHRBBoxCoder
(/root/reference/mmdet3d/core/bbox/coders/delta_xyzwhlr_bbox_coder.py):
SECOND-style residual encoding against anchors with diagonal
normalization.
"""
from __future__ import annotations

import jax.numpy as jnp


def delta_encode(boxes, anchors):
    """[..., 7] GT boxes vs anchors -> deltas (xt..rt)."""
    xa, ya, za, wa, la, ha, ra = jnp.split(anchors, 7, axis=-1)
    xg, yg, zg, wg, lg, hg, rg = jnp.split(boxes, 7, axis=-1)
    za = za + ha / 2
    zg = zg + hg / 2
    diag = jnp.sqrt(la ** 2 + wa ** 2)
    xt = (xg - xa) / diag
    yt = (yg - ya) / diag
    zt = (zg - za) / ha
    lt = jnp.log(jnp.maximum(lg, 1e-6) / la)
    wt = jnp.log(jnp.maximum(wg, 1e-6) / wa)
    ht = jnp.log(jnp.maximum(hg, 1e-6) / ha)
    rt = rg - ra
    return jnp.concatenate([xt, yt, zt, wt, lt, ht, rt], axis=-1)


def delta_decode(deltas, anchors):
    """Inverse of delta_encode -> [..., 7] boxes (bottom-center z)."""
    xa, ya, za, wa, la, ha, ra = jnp.split(anchors, 7, axis=-1)
    xt, yt, zt, wt, lt, ht, rt = jnp.split(deltas, 7, axis=-1)
    za = za + ha / 2
    diag = jnp.sqrt(la ** 2 + wa ** 2)
    xg = xt * diag + xa
    yg = yt * diag + ya
    zg = zt * ha + za
    lg = jnp.exp(lt) * la
    wg = jnp.exp(wt) * wa
    hg = jnp.exp(ht) * ha
    rg = rt + ra
    zg = zg - hg / 2
    return jnp.concatenate([xg, yg, zg, wg, lg, hg, rg], axis=-1)
