"""Cyclic schedule semantics (mmcv CyclicLrUpdater equivalence)."""
import jax.numpy as jnp
import numpy as np

from gga_tpu.train.optim import build_optimizer, cyclic_cos_schedule


def test_cyclic_lr_shape():
    total = 1000
    sched = cyclic_cos_schedule(1.5e-3, (10, 1e-4), 0.4, total)
    lrs = np.array([float(sched(jnp.asarray(s))) for s in
                    range(0, total, 10)])
    # starts at base, peaks at base*10 at 40%, anneals to base*1e-4
    np.testing.assert_allclose(lrs[0], 1.5e-3, rtol=1e-5)
    peak_idx = np.argmax(lrs)
    assert abs(peak_idx * 10 - 0.4 * total) <= 10
    np.testing.assert_allclose(lrs[peak_idx], 1.5e-2, rtol=1e-3)
    assert lrs[-1] < 1.5e-5  # annealed close to base*1e-4
    # monotone up then down
    assert (np.diff(lrs[:peak_idx]) >= -1e-9).all()
    assert (np.diff(lrs[peak_idx:]) <= 1e-9).all()


def test_cyclic_momentum_shape():
    total = 1000
    sched = cyclic_cos_schedule(0.95, (0.8947368421052632, 1.0), 0.4,
                                total)
    ms = np.array([float(sched(jnp.asarray(s))) for s in range(0, total,
                                                               10)])
    np.testing.assert_allclose(ms[0], 0.95, rtol=1e-5)
    trough = np.argmin(ms)
    np.testing.assert_allclose(ms[trough], 0.85, rtol=1e-3)
    np.testing.assert_allclose(ms[-1], 0.95, rtol=1e-2)


def test_optimizer_clips_gradients():
    import optax
    tx = build_optimizer(total_steps=100, grad_clip=1.0)
    params = {'w': jnp.zeros(3)}
    state = tx.init(params)
    huge = {'w': jnp.asarray([1e6, 0.0, 0.0])}
    updates, _ = tx.update(huge, state, params)
    # post-clip global norm is 1 -> update magnitude bounded by lr*~10
    assert float(jnp.abs(updates['w']).max()) < 1.0
