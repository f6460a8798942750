"""PAConv: score-mixed kernels, regularization loss, segmentor step."""
import jax
import jax.numpy as jnp
import numpy as np

from gga_tpu.models.backbones.paconv import (PAConvConfig, PAConvLayer,
                                             PAConvSegmentor,
                                             paconv_regularization_loss)


def test_paconv_layer_shapes_and_score_mixture():
    layer = PAConvLayer(out_channels=8, num_kernels=4)
    rng = np.random.RandomState(0)
    feats = jnp.asarray(rng.randn(2, 8, 6, 5), jnp.float32)
    rel = jnp.asarray(rng.randn(2, 8, 6, 3), jnp.float32)
    ctr = jnp.asarray(rng.randn(2, 8, 3), jnp.float32)
    mask = jnp.ones((2, 8, 6), bool)
    v = layer.init(jax.random.PRNGKey(0), feats, rel, ctr, mask,
                   False)
    out = layer.apply(v, feats, rel, ctr, mask, False)
    assert out.shape == (2, 8, 6, 8)
    assert v['params']['weight_bank'].shape == (10, 4 * 8)


def test_regularization_loss_orthogonal_vs_identical():
    m, cin, cout = 4, 6, 3
    eye = np.zeros((cin, m * cout), np.float32)
    # orthogonal kernels: disjoint support
    for k in range(m):
        eye[k, k * cout:(k + 1) * cout] = 1.0
    same = np.tile(np.random.RandomState(0).randn(cin, cout), (1, m))
    l_orth = paconv_regularization_loss({'weight_bank': jnp.asarray(eye)},
                                        num_kernels=m)
    l_same = paconv_regularization_loss({'weight_bank': jnp.asarray(same)},
                                        num_kernels=m)
    assert float(l_orth) < 1e-6
    assert float(l_same) > 1.0


def test_paconv_segmentor_step():
    cfg = PAConvConfig(in_channels=6, num_points=(32, 16, 8, 4),
                       sa_channels=((8, 8),) * 4,
                       fp_channels=((8,), (8,), (8,), (8,)),
                       num_kernels=4, num_classes=5, head_channels=8)
    model = PAConvSegmentor(cfg)
    rng = np.random.RandomState(0)
    pts = jnp.asarray(rng.randn(2, 64, 6), jnp.float32)
    valid = jnp.ones((2, 64), bool)
    variables = model.init(jax.random.PRNGKey(0), pts, valid,
                           train=False)
    out = model.apply(variables, pts, valid, train=False)
    assert out.shape == (2, 64, 5)

    labels = jnp.asarray(rng.randint(0, 5, (2, 64)), jnp.int32)

    def loss_fn(params):
        o, _ = model.apply(
            {'params': params,
             'batch_stats': variables['batch_stats']},
            pts, valid, train=True, mutable=['batch_stats'],
            rngs={'dropout': jax.random.PRNGKey(1)})
        logp = jax.nn.log_softmax(o, -1)
        ce = -jnp.take_along_axis(logp, labels[..., None], -1)[..., 0]
        return ce.mean() + paconv_regularization_loss(
            params, num_kernels=cfg.num_kernels)

    grads = jax.jit(jax.grad(loss_fn))(variables['params'])
    assert all(np.all(np.isfinite(np.asarray(g)))
               for g in jax.tree_util.tree_leaves(grads))
