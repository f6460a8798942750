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
