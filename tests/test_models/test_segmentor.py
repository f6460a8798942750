"""EncoderDecoder3D point-cloud semantic segmentation."""
import jax
import jax.numpy as jnp
import numpy as np

from gga_tpu.models.segmentors import (EncoderDecoder3D,
                                       EncoderDecoder3DConfig,
                                       segmentation_loss)


def _scene(B=1, P=512, seed=0):
    rng = np.random.RandomState(seed)
    xyz = rng.uniform(0, 4, (B, P, 3)).astype(np.float32)
    rgb = rng.rand(B, P, 3).astype(np.float32)
    pts = np.concatenate([xyz, rgb], -1)
    valid = np.ones((B, P), bool)
    valid[:, P - 50:] = False  # padded tail
    labels = rng.randint(0, 6, (B, P)).astype(np.int32)
    return jnp.asarray(pts), jnp.asarray(valid), jnp.asarray(labels)


def test_segmentor_forward_and_loss():
    cfg = EncoderDecoder3DConfig.tiny()
    model = EncoderDecoder3D(cfg)
    pts, valid, labels = _scene()
    variables = model.init(jax.random.PRNGKey(0), pts, valid, train=False)
    logits = model.apply(variables, pts, valid, train=False)
    assert logits.shape == (1, 512, 6)
    assert bool(jnp.isfinite(logits).all())
    # padded points produce zero logits
    assert float(jnp.abs(logits[:, -50:]).max()) == 0.0

    loss = segmentation_loss(logits, labels, valid)
    assert np.isfinite(float(loss)) and float(loss) > 0
    # ignore_index removes those labels from the loss
    lab2 = labels.at[:, :256].set(6)
    l_ign = segmentation_loss(logits, lab2, valid, ignore_index=6)
    assert np.isfinite(float(l_ign))
    # class weights change the loss
    w = jnp.asarray([2.0, 1.0, 1.0, 1.0, 1.0, 1.0])
    lw = segmentation_loss(logits, labels, valid, class_weights=w)
    assert abs(float(lw) - float(loss)) > 1e-6


def test_segmentor_train_step_gradients():
    cfg = EncoderDecoder3DConfig.tiny()
    model = EncoderDecoder3D(cfg)
    pts, valid, labels = _scene(seed=1)
    variables = model.init(jax.random.PRNGKey(0), pts, valid, train=False)

    def loss_fn(params):
        logits = model.apply(
            {'params': params, **{k: v for k, v in variables.items()
                                  if k != 'params'}},
            pts, valid, train=True, rngs={'dropout': jax.random.PRNGKey(1)},
            mutable=['batch_stats'])[0]
        return segmentation_loss(logits, labels, valid)

    loss, grads = jax.value_and_grad(loss_fn)(variables['params'])
    gn = float(jnp.sqrt(sum(jnp.sum(g ** 2)
                            for g in jax.tree_util.tree_leaves(grads))))
    assert np.isfinite(float(loss)) and np.isfinite(gn) and gn > 0
