"""DGCNN: masked knn graph, GF edge features, segmentor forward +
grads."""
import jax
import jax.numpy as jnp
import numpy as np

from gga_tpu.models.backbones.dgcnn import (DGCNNBackbone, DGCNNConfig,
                                            DGCNNSegmentor,
                                            masked_knn_graph)


def test_masked_knn_excludes_padding():
    f = jnp.asarray([[0.0, 0], [0.1, 0], [5.0, 0], [0.2, 0]])
    valid = jnp.asarray([True, True, False, True])
    idx = masked_knn_graph(f, valid, 3)
    # the invalid point (2) never appears as a neighbor
    assert 2 not in np.asarray(idx)[[0, 1, 3]].ravel()


def test_dgcnn_segmentor_forward_and_grads():
    cfg = DGCNNConfig(in_channels=6, num_samples=(4, 4, 4),
                      gf_channels=((8, 8), (8, 8), (8,)),
                      fa_channels=(16,), num_classes=5,
                      fp_channels=(16,), head_channels=8)
    model = DGCNNSegmentor(cfg)
    rng = np.random.RandomState(0)
    pts = jnp.asarray(rng.randn(2, 64, 6), jnp.float32)
    valid = jnp.ones((2, 64), bool).at[:, 50:].set(False)
    variables = model.init(jax.random.PRNGKey(0), pts, valid,
                           train=False)
    logits = model.apply(variables, pts, valid, train=False)
    assert logits.shape == (2, 64, 5)

    labels = jnp.asarray(rng.randint(0, 5, (2, 64)), jnp.int32)

    def loss_fn(params):
        out, _ = model.apply(
            {'params': params,
             'batch_stats': variables['batch_stats']},
            pts, valid, train=True, mutable=['batch_stats'],
            rngs={'dropout': jax.random.PRNGKey(1)})
        logp = jax.nn.log_softmax(out, -1)
        ce = -jnp.take_along_axis(logp, labels[..., None], -1)[..., 0]
        return (ce * valid).sum() / valid.sum()

    grads = jax.jit(jax.grad(loss_fn))(variables['params'])
    assert all(np.all(np.isfinite(np.asarray(g)))
               for g in jax.tree_util.tree_leaves(grads))
