"""ImVoteNet: vote-fusion cue semantics, valid-seed sampling, 3-tower
train step with finite grads, decode."""
import jax
import jax.numpy as jnp
import numpy as np

from gga_tpu.models.detectors.imvotenet import (ImVoteNet,
                                                ImVoteNetConfig,
                                                decode_imvotenet,
                                                imvotenet_loss)
from gga_tpu.models.fusion_layers.vote_fusion import (VoteFusionConfig,
                                                      sample_valid_seeds,
                                                      vote_fusion)


def _depth2img(f=80.0, cx=64.0, cy=48.0):
    k = np.zeros((4, 4), np.float32)
    # depth (x right, y forward/depth? DEPTH coords: z up, y forward)
    # simple pinhole mapping x->u (depth y as the optical axis)
    k[0] = [f, 0, 0, f * cx / f]
    k[0] = [f, cx, 0, 0]
    k[1] = [0, cy, -f, 0]
    k[2] = [0, 1, 0, 0]
    k[3] = [0, 0, 0, 1]
    return k


def test_vote_fusion_cues():
    cfg = VoteFusionConfig(num_classes=4, max_imvote_per_pixel=2)
    img = jnp.full((96, 128, 3), 127.5)
    d2i = jnp.asarray(_depth2img())
    seed = jnp.asarray([[0.0, 5.0, 0.0], [3.0, 5.0, 0.5]])
    sv = jnp.ones(2, bool)
    # project seed 0: u = (f*0 + cx*5)/5 - 1 = 63, v = (cy*5 - f*0)/5 - 1
    boxes = jnp.asarray([[50.0, 30.0, 80.0, 60.0, 0.9, 2.0],
                         [0.0, 0.0, 10.0, 10.0, 0.8, 1.0]])
    bv = jnp.asarray([True, True])
    cues, mask = vote_fusion(cfg, img, boxes, bv, seed, sv, d2i)
    assert cues.shape == (2 * 2, 5 + 4 + 3)
    m = np.asarray(mask).reshape(2, 2)
    assert m[0, 0] and not m[0, 1]     # seed 0 in box 0 only
    assert not m[1].any()              # seed 1 projects outside boxes
    c0 = np.asarray(cues[0])
    # semantic cue: class 2 one-hot * conf
    np.testing.assert_allclose(c0[5:9], [0, 0, 0.9, 0], atol=1e-6)
    # texture cue: normalized pixel
    np.testing.assert_allclose(c0[9:], 0.5, atol=1e-3)
    # ray direction is unit-norm
    assert abs(np.linalg.norm(c0[2:5]) - 1.0) < 1e-5


def test_sample_valid_seeds_cyclic():
    mask = jnp.asarray([False, True, False, True, False, False])
    idx = sample_valid_seeds(mask, 5, jax.random.PRNGKey(0))
    idx = np.asarray(idx)
    # first two picks are the valid entries, rest cycle through them
    assert set(idx[:2]) == {1, 3}
    assert all(i in (1, 3) for i in idx)


def _batch(rng, B=2, P=256, G=3, Kb=4):
    pts = rng.uniform(-3, 3, (B, P, 4)).astype(np.float32)
    pts[..., 1] += 5.0
    gt = np.zeros((B, G, 7), np.float32)
    gt[..., 0] = rng.uniform(-2, 2, (B, G))
    gt[..., 1] = rng.uniform(3, 7, (B, G))
    gt[..., 2] = -0.5
    gt[..., 3:6] = 1.0
    gt[..., 6] = rng.uniform(-np.pi, np.pi, (B, G))
    img = rng.randint(0, 255, (B, 96, 128, 3)).astype(np.float32)
    boxes = np.zeros((B, Kb, 6), np.float32)
    boxes[..., 0] = 10; boxes[..., 1] = 10
    boxes[..., 2] = 100; boxes[..., 3] = 80
    boxes[..., 4] = 0.8
    boxes[..., 5] = rng.randint(0, 4, (B, Kb))
    d2i = np.tile(_depth2img(), (B, 1, 1))
    return (jnp.asarray(pts), jnp.ones((B, P), bool), jnp.asarray(gt),
            jnp.asarray(rng.randint(0, 4, (B, G)), jnp.int32),
            jnp.ones((B, G), bool), jnp.asarray(img), jnp.asarray(boxes),
            jnp.ones((B, Kb), bool), jnp.asarray(d2i))


def test_imvotenet_train_step_and_decode():
    rng = np.random.RandomState(0)
    pts, pv, gt, gl, gv, img, boxes, bval, d2i = _batch(rng)
    cfg = ImVoteNetConfig.tiny()
    model = ImVoteNet(cfg)
    key = jax.random.PRNGKey(0)
    variables = model.init(key, pts, pv, img, boxes, bval, d2i,
                           rng=key, train=True)

    def loss_fn(params):
        towers, _ = model.apply(
            {'params': params,
             'batch_stats': variables['batch_stats']},
            pts, pv, img, boxes, bval, d2i, rng=key, train=True,
            mutable=['batch_stats'])
        assert len(towers) == 3
        return imvotenet_loss(cfg, towers, pts, pv, gt, gl, gv)

    (total, logs), grads = jax.jit(
        lambda p: jax.value_and_grad(loss_fn, has_aux=True)(p))(
        variables['params'])
    assert np.isfinite(float(total)), {k: float(v)
                                       for k, v in logs.items()}
    assert all(np.all(np.isfinite(np.asarray(g)))
               for g in jax.tree_util.tree_leaves(grads))
    assert float(logs['loss_joint']) > 0

    towers = model.apply(variables, pts, pv, img, boxes, bval, d2i,
                         train=False)
    det = jax.jit(lambda p: decode_imvotenet(cfg, p))(towers[0])
    assert det['boxes'].shape[-1] == 7
