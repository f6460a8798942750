"""ImVoxelNet: image -> 3D volume lift -> BEV head."""
import jax
import jax.numpy as jnp
import numpy as np

from gga_tpu.models.detectors.imvoxelnet import ImVoxelNet, ImVoxelNetConfig


def _inputs(B=1, H=64, W=96, seed=0):
    rng = np.random.RandomState(seed)
    img = rng.rand(B, H, W, 3).astype(np.float32)
    # KITTI-style: lidar x forward is camera depth
    l2i = np.zeros((B, 4, 4), np.float32)
    l2i[:, 0, 1] = -50; l2i[:, 0, 0] = 48
    l2i[:, 1, 2] = -50; l2i[:, 1, 0] = 32
    l2i[:, 2, 0] = 1; l2i[:, 3, 3] = 1
    return jnp.asarray(img), jnp.asarray(l2i)


def test_imvoxelnet_forward_shapes():
    cfg = ImVoxelNetConfig.tiny()
    model = ImVoxelNet(cfg)
    img, l2i = _inputs()
    variables = model.init(jax.random.PRNGKey(0), img, l2i, train=False)
    preds = model.apply(variables, img, l2i, train=False)
    cls = preds['cls'] if isinstance(preds, dict) else preds[0]
    ny, nx = cfg.n_voxels[1], cfg.n_voxels[0]
    assert cls.shape[1:3] == (ny, nx)
    assert bool(jnp.isfinite(cls).all())
    # image reaches the BEV predictions (single 2D->3D lift, no deep
    # sparse stack in between, so the signal survives to the head)
    preds0 = model.apply(variables, jnp.zeros_like(img), l2i, train=False)
    cls0 = preds0['cls'] if isinstance(preds0, dict) else preds0[0]
    assert float(jnp.abs(cls - cls0).max()) > 1e-6


def test_indoor_imvoxelnet_loss_decode():
    """Indoor variant (sunrgbd config): forward -> FCAF-style per-voxel
    targets -> finite loss/grads -> decode."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gga_tpu.models.dense_heads import imvoxel_head as ih
    from gga_tpu.models.detectors.imvoxelnet import (
        ImVoxelNetIndoor, ImVoxelNetIndoorConfig)

    cfg = ImVoxelNetIndoorConfig.tiny()
    m = ImVoxelNetIndoor(cfg)
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(2, 96, 128, 3).astype(np.float32))
    # DEPTH coords (x right, y fwd, z up): u=(60x+64y)/y, v=(48y-60z)/y
    l2i = np.zeros((2, 4, 4), np.float32)
    l2i[:, 0] = [60, 64, 0, 0]
    l2i[:, 1] = [0, 48, -60, 0]
    l2i[:, 2] = [0, 1, 0, 0]
    l2i[:, 3] = [0, 0, 0, 1]
    l2i = jnp.asarray(l2i)
    var = m.init(jax.random.PRNGKey(0), img, l2i, train=False)
    preds, valids = m.apply(var, img, l2i, train=False)
    assert len(preds) == 3 and len(valids) == 3
    assert float(valids[0].mean()) > 0.3

    gt = jnp.zeros((2, 4, 7)).at[:, 0].set(
        jnp.asarray([0.5, 2.0, -1.0, 0.8, 0.9, 0.8, 0.3]))
    gl = jnp.zeros((2, 4), jnp.int32)
    gv = jnp.zeros((2, 4), bool).at[:, 0].set(True)

    def inner(p):
        (pr, va), _ = m.apply(
            {'params': p, **{k: v for k, v in var.items()
                             if k != 'params'}},
            img, l2i, train=True, mutable=['batch_stats'])
        total, logs = ih.loss(cfg.head, pr, va, gt, gl, gv)
        return total, logs

    (l, logs), g = jax.value_and_grad(inner, has_aux=True)(var['params'])
    assert np.isfinite(float(l)) and int(logs['num_pos']) > 0
    assert all(np.isfinite(np.asarray(x)).all()
               for x in jax.tree_util.tree_leaves(g))

    dets = ih.decode(cfg.head, preds, valids)
    assert dets['boxes'].shape[-1] == 7
    assert np.isfinite(np.asarray(dets['boxes'])).all()
