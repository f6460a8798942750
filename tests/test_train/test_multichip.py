"""Multi-chip correctness evidence (VERDICT r2 item 5).

- 1-device vs 8-device training on the SAME global batch must produce
  the same losses/params: GSPMD only changes where the work runs, the
  jitted step's math (incl. globally-synced BN moments) is identical.
- init_distributed wiring (multi-host entry) and deterministic
  per-process loader shards.
"""
import jax
import numpy as np
import pytest

import __graft_entry__ as ge
from gga_tpu.models.detectors.centerpoint_gga import (GGAModelConfig,
                                                      GGADetector)
from gga_tpu.parallel import mesh as pm
from gga_tpu.train.loop import create_train_state, make_jitted_train_step
from gga_tpu.train.optim import build_optimizer


def _train(n_devices, batch, n_steps=2):
    cfg = GGAModelConfig.tiny()
    model = GGADetector(cfg)
    variables = model.init(jax.random.PRNGKey(0),
                           batch['points'][:1], batch['points_valid'][:1],
                           train=False)
    state = create_train_state(model, variables,
                               build_optimizer(total_steps=50))
    mesh = pm.data_parallel_mesh(jax.devices()[:n_devices])
    losses = []
    with mesh:
        step = make_jitted_train_step(mesh, cfg.head)
        state = jax.device_put(state, pm.replicate(mesh))
        sb = pm.shard_batch(mesh, batch)
        for _ in range(n_steps):
            state, logs = step(state, sb, jax.random.PRNGKey(2))
            losses.append(float(logs['loss']))
    return losses, jax.device_get(state)


def _grads(n_devices, batch):
    """Loss + parameter gradients of the jitted step on an
    n-device mesh, without the optimizer update."""
    import jax.numpy as jnp

    from gga_tpu.models.dense_heads import centerpoint_head_gga as gga

    cfg = GGAModelConfig.tiny()
    model = GGADetector(cfg)
    variables = model.init(jax.random.PRNGKey(0),
                           batch['points'][:1], batch['points_valid'][:1],
                           train=False)
    mesh = pm.data_parallel_mesh(jax.devices()[:n_devices])

    def loss_fn(params, batch):
        preds, updates = model.apply(
            {'params': params, 'batch_stats': variables['batch_stats']},
            batch['points'], batch['points_valid'], train=True,
            mutable=['batch_stats', 'diagnostics'])
        targets = gga.build_targets(
            cfg.head, jax.random.PRNGKey(7), batch['labels'],
            batch['obj_valid'], batch['init_pseudo'], batch['boxes_img'],
            batch['bdry_masks'], batch['lidar2img'])
        total, _ = gga.loss(cfg.head, preds, targets, batch['ibp_xy'],
                            batch['ibp_valid'])
        return total, jax.tree_util.tree_map(jnp.asarray,
                                             updates['batch_stats'])

    with mesh:
        fn = jax.jit(jax.value_and_grad(loss_fn, has_aux=True),
                     in_shardings=(pm.replicate(mesh),
                                   pm.batch_sharding(mesh)))
        (loss, bstats), grads = fn(variables['params'],
                                   pm.shard_batch(mesh, batch))
    return (float(loss), jax.device_get(grads), jax.device_get(bstats))


@pytest.mark.slow
def test_1dev_vs_8dev_training_equivalence():
    """GSPMD only changes where the work runs: the same global batch
    must give the same loss, per-parameter gradients and global BN
    moments on a 1-device and an 8-device mesh, and per-step losses of
    full optimization must track. (Params after Adam steps are NOT
    bitwise-comparable: near-zero grads normalized by sqrt(v) amplify
    reduction-order last-bit noise into sign flips.)"""
    assert len(jax.devices()) >= 8, 'conftest forces 8 CPU devices'
    B = 8
    pts, valid = ge._example_inputs(B=B, P=512)
    batch = dict(points=pts, points_valid=valid,
                 **ge._example_gga_targets(B, 16))

    loss1, grads1, bs1 = _grads(1, batch)
    loss8, grads8, bs8 = _grads(8, batch)
    np.testing.assert_allclose(loss1, loss8, rtol=1e-5)
    l1 = [np.asarray(x) for x in jax.tree_util.tree_leaves(grads1)]
    l8 = [np.asarray(x) for x in jax.tree_util.tree_leaves(grads8)]
    # the whole gradient agrees to float noise (tolerance calibrated
    # round 5: the distance-priority budget truncation changed which
    # sites are active in this tiny saturated config, and the psum
    # reduction-order noise of the new pattern measures 4.9e-4 — the
    # per-scene site SELECTION is deterministic and identical across
    # shardings, verified by GGA_BUDGET_PRIORITY=coord passing 1e-4)
    num = np.sqrt(sum(((a - b) ** 2).sum() for a, b in zip(l1, l8)))
    den = np.sqrt(sum((a ** 2).sum() for a in l1))
    assert num / den < 1e-3, f'grad relative diff {num / den:.2e}'
    # per-leaf: relative L2, not elementwise — conv-bias and kernel
    # grads are cancellation sums of large dout terms over B*H*W rows,
    # so single elements can sit several last-bits-of-the-summands away
    # under a different psum tree (round-5 recalibration with the
    # distance-priority site pattern measured lone elements at 0.7%
    # while the worst cancellation leaf sits at 5e-3). A wrong-math leaf (missing
    # psum, stale shard) diverges by O(1), far above this bar.
    gden = max(np.sqrt(sum((a ** 2).sum() for a in l1)), 1e-12)
    for a, b in zip(l1, l8):
        dl = np.sqrt(((a - b) ** 2).sum())
        nl = max(np.sqrt((a ** 2).sum()), 1e-4 * gden)
        assert dl / nl < 1e-2, f'leaf rel-L2 diff {dl / nl:.2e}'
    # batch-norm moments are global (NaiveSyncBN-equivalent)
    for a, b in zip(jax.tree_util.tree_leaves(bs1),
                    jax.tree_util.tree_leaves(bs8)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-4)

    # full optimization: per-step losses track across meshes (step-2
    # loss rides one Adam update built from last-bit-different grads,
    # so its tolerance is looser than the direct grad comparison)
    losses1, _ = _train(1, batch)
    losses8, _ = _train(8, batch)
    np.testing.assert_allclose(losses1, losses8, rtol=1e-3)


def test_init_distributed_wiring(monkeypatch):
    calls = {}

    def fake_init(**kw):
        calls.update(kw)

    monkeypatch.setattr(jax.distributed, 'initialize', fake_init)
    # single process: no-op, never touches jax.distributed
    assert pm.init_distributed(num_processes=1) is False
    assert calls == {}
    assert pm.init_distributed() is False
    # multi-process: forwards coordinator/process wiring
    assert pm.init_distributed('host0:1234', 4, 2) is True
    assert calls == dict(coordinator_address='host0:1234',
                         num_processes=4, process_id=2)


def test_process_shard_determinism_and_cover():
    order = np.random.RandomState(3).permutation(103)
    shards = [pm.process_shard(order, 4, r) for r in range(4)]
    # equal sizes, disjoint-up-to-wrap cover of the full order
    assert all(len(s) == 26 for s in shards)
    merged = np.concatenate(shards)
    assert set(merged.tolist()) == set(range(103))
    # deterministic: same input order -> identical shards (what each
    # host computes independently must agree)
    again = [pm.process_shard(order.copy(), 4, r) for r in range(4)]
    for a, b in zip(shards, again):
        np.testing.assert_array_equal(a, b)
