"""FreeAnchor3D loss: bag construction and learning-to-match behavior."""
import jax
import jax.numpy as jnp
import numpy as np

from gga_tpu.models.dense_heads.anchor3d_head import make_anchors
from gga_tpu.models.dense_heads.free_anchor3d_head import (
    FreeAnchor3DConfig, free_anchor_loss)
from gga_tpu.core.coders import delta_encode


def _cfg():
    return FreeAnchor3DConfig(
        num_classes=2, feat_channels=8, pre_anchor_topk=8,
        anchor_sizes=((3.9, 1.6, 1.56), (0.8, 0.6, 1.73)),
        anchor_ranges=((0, -8, -1.78, 16, 8, -1.78),) * 2,
        pos_iou_thr=(0.6, 0.5), neg_iou_thr=(0.45, 0.35),
        min_pos_iou=(0.45, 0.35))


def _maps(cfg, H, W, rng, good_gt=None, anchors=None):
    C = cfg.num_classes
    R = len(cfg.rotations)
    cls = rng.randn(1, H, W, C * R * C).astype(np.float32) - 4.0
    reg = (rng.randn(1, H, W, C * R * 7) * 0.1).astype(np.float32)
    dirm = rng.randn(1, H, W, C * R * 2).astype(np.float32)
    if good_gt is not None:
        # write near-perfect predictions for every anchor of class 0
        anc = np.asarray(anchors)          # [C, A, 7]
        enc = np.asarray(delta_encode(
            jnp.broadcast_to(jnp.asarray(good_gt), anc[0].shape),
            jnp.asarray(anc[0])))
        A = anc.shape[1]
        reg_flat = reg.reshape(1, H * W, C, R, 7)
        enc_r = enc.reshape(H * W, R, 7)
        reg_flat[0, :, 0] = enc_r
        reg = reg_flat.reshape(1, H, W, C * R * 7)
        cls_flat = cls.reshape(1, H * W, C, R, C)
        cls_flat[0, :, 0, :, 0] = 6.0      # confident class 0
        cls = cls_flat.reshape(1, H, W, C * R * C)
    return dict(cls=jnp.asarray(cls), reg=jnp.asarray(reg),
                dir=jnp.asarray(dirm))


def test_free_anchor_loss_finite_and_ordering():
    cfg = _cfg()
    H = W = 8
    anchors = make_anchors(cfg, (H, W))
    rng = np.random.RandomState(0)
    gt = jnp.asarray([[[8.0, 0.0, -2.5, 3.9, 1.6, 1.5, 0.0]]])
    gl = jnp.asarray([[0]])
    gv = jnp.asarray([[True]])

    bad = _maps(cfg, H, W, rng)
    good = _maps(cfg, H, W, rng, good_gt=np.asarray(gt[0, 0]),
                 anchors=anchors)

    l_bad, logs_bad = jax.jit(
        lambda p: free_anchor_loss(cfg, p, anchors, gt, gl, gv))(bad)
    l_good, logs_good = jax.jit(
        lambda p: free_anchor_loss(cfg, p, anchors, gt, gl, gv))(good)
    assert np.isfinite(float(l_bad)) and np.isfinite(float(l_good))
    # confident correct predictions shrink the positive bag loss a lot
    assert float(logs_good['positive_bag_loss']) \
        < 0.2 * float(logs_bad['positive_bag_loss'])


def test_free_anchor_grads_finite():
    cfg = _cfg()
    H = W = 8
    anchors = make_anchors(cfg, (H, W))
    rng = np.random.RandomState(1)
    maps = _maps(cfg, H, W, rng)
    gt = jnp.asarray([[[8.0, 0.0, -2.5, 3.9, 1.6, 1.5, 0.3],
                       [4.0, 2.0, -2.5, 0.8, 0.6, 1.7, 0.0]]])
    gl = jnp.asarray([[0, 1]])
    gv = jnp.asarray([[True, True]])

    def loss_fn(m):
        return free_anchor_loss(cfg, m, anchors, gt, gl, gv)[0]

    grads = jax.jit(jax.grad(loss_fn))(maps)
    assert all(np.all(np.isfinite(np.asarray(g)))
               for g in jax.tree_util.tree_leaves(grads))
