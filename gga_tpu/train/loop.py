"""Training state and the pjit-ed GGA train step.

Equivalent of the reference's EpochBasedRunner + OptimizerHook path
(/root/reference/mmdet3d/apis/train.py:324) rebuilt as a single jitted
function over a data-parallel mesh: model forward, GGA target build, loss,
grad, clip, AdamW update and batch-stats update all trace into one XLA
program; gradient all-reduce is inserted by GSPMD.
"""
from __future__ import annotations

from typing import Any

import flax.struct
import jax
import jax.numpy as jnp
import optax

from ..models.dense_heads import centerpoint_head_gga as gga
from ..models.detectors.centerpoint_gga import GGADetector


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = flax.struct.field(pytree_node=False)
    apply_fn: Any = flax.struct.field(pytree_node=False)


def create_train_state(model: GGADetector, variables, tx) -> TrainState:
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables['params'],
        batch_stats=variables['batch_stats'],
        opt_state=tx.init(variables['params']),
        tx=tx,
        apply_fn=model.apply,
    )


def gga_train_step(state: TrainState, batch, rng, head_cfg):
    """One optimization step.

    Args:
        batch: dict with
            points [B, P, 4], points_valid [B, P],
            labels [B, M], obj_valid [B, M], init_pseudo [B, M, 7],
            boxes_img [B, M, 4], bdry_masks [B, M, 4],
            lidar2img [B, M, 4, 4], ibp_xy [B, M, Pc, 2],
            ibp_valid [B, M, Pc].
        rng: PRNG key folded with the step for per-step SRL sampling.

    Returns:
        (new_state, logs dict).
    """
    step_rng = jax.random.fold_in(rng, state.step)

    def loss_fn(params):
        preds, updates = state.apply_fn(
            {'params': params, 'batch_stats': state.batch_stats},
            batch['points'], batch['points_valid'], train=True,
            mutable=['batch_stats', 'diagnostics'])
        targets = gga.build_targets(
            head_cfg, step_rng, batch['labels'], batch['obj_valid'],
            batch['init_pseudo'], batch['boxes_img'], batch['bdry_masks'],
            batch['lidar2img'])
        total, logs = gga.loss(head_cfg, preds, targets, batch['ibp_xy'],
                               batch['ibp_valid'])
        # sparse-encoder budget occupancy guardrails (flax sow)
        for path, leaf in jax.tree_util.tree_leaves_with_path(
                updates.get('diagnostics', {})):
            name = path[-2].key if len(path) >= 2 else 'diag'
            logs[f'diag.{name}'] = jnp.asarray(leaf).mean()
        return total, (logs, updates['batch_stats'])

    (total, (logs, new_bs)), grads = jax.value_and_grad(
        loss_fn, has_aux=True)(state.params)
    updates, new_opt = state.tx.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)
    logs['grad_norm'] = optax.global_norm(grads)
    new_state = state.replace(step=state.step + 1, params=new_params,
                              batch_stats=new_bs, opt_state=new_opt)
    return new_state, logs


def make_jitted_train_step(mesh, head_cfg, axis_name='data'):
    """jit gga_train_step with batch sharded over the mesh and
    state replicated (out shardings inferred)."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    batch_sh = NamedSharding(mesh, P(axis_name))
    repl = NamedSharding(mesh, P())

    def step(state, batch, rng):
        return gga_train_step(state, batch, rng, head_cfg)

    # sharding pytree prefixes: one sharding covers each whole subtree
    return jax.jit(step, in_shardings=(repl, batch_sh, repl),
                   donate_argnums=(0,))
