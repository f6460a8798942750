"""Conv+BN folding: eval-mode outputs identical before/after fusion."""
import jax
import jax.numpy as jnp
import numpy as np

from gga_tpu.models.backbones.second import SECOND
from gga_tpu.utils.fuse_conv_bn import fuse_conv_bn


def test_fuse_second_backbone_exact():
    model = SECOND(in_channels=8, out_channels=(8, 16),
                   layer_nums=(1, 1), layer_strides=(1, 2))
    x = jnp.asarray(np.random.RandomState(0).randn(1, 16, 16, 8),
                    jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    # give BN non-trivial running stats
    stats = jax.tree_util.tree_map(
        lambda a: a + 0.3 if a.ndim == 1 else a,
        variables['batch_stats'])
    variables = {'params': variables['params'], 'batch_stats': stats}
    ref = model.apply(variables, x, train=False)

    params_f, stats_f, n = fuse_conv_bn(variables['params'],
                                        variables['batch_stats'])
    assert n > 0
    out = model.apply({'params': params_f, 'batch_stats': stats_f}, x,
                      train=False)
    np.testing.assert_allclose(np.asarray(out[-1]), np.asarray(ref[-1]),
                               rtol=2e-5, atol=2e-5)
