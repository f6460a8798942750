"""Optimizers and schedules.

Rebuilds the reference's mmcv training recipe
(/root/reference/configs/gga/gga_kitti_config.py:233-248) in optax:
AdamW(lr 1.5e-3, betas (0.95, 0.99), wd 0.01), global-norm grad clip 35,
one-cycle cyclic LR (x10 up over 40%, down to x1e-4, cosine annealing) and
the matching cyclic beta1 (momentum) schedule.
"""
from __future__ import annotations

import jax.numpy as jnp
import optax


def cyclic_cos_schedule(base_value, target_ratio=(10, 1e-4),
                        step_ratio_up=0.4, total_steps=1000,
                        cyclic_times=1):
    """mmcv CyclicLrUpdaterHook with anneal_strategy='cos'.

    One cycle = up phase (base -> base*ratio[0], cosine) then down phase
    (base*ratio[0] -> base*ratio[1], cosine).
    """
    cycle_len = max(total_steps // cyclic_times, 1)
    up_len = int(cycle_len * step_ratio_up)

    def schedule(step):
        s = jnp.mod(step, cycle_len)
        up_pct = jnp.clip(s / jnp.maximum(up_len, 1), 0.0, 1.0)
        down_pct = jnp.clip((s - up_len) / jnp.maximum(cycle_len - up_len, 1),
                            0.0, 1.0)

        def cos_anneal(start, end, pct):
            return end + 0.5 * (start - end) * (1 + jnp.cos(jnp.pi * pct))

        hi = base_value * target_ratio[0]
        lo = base_value * target_ratio[1]
        up = cos_anneal(base_value, hi, up_pct)
        down = cos_anneal(hi, lo, down_pct)
        return jnp.where(s < up_len, up, down)

    return schedule


def build_optimizer(total_steps, lr=1.5e-3, betas=(0.95, 0.99),
                    weight_decay=0.01, grad_clip=35.0,
                    lr_target_ratio=(10, 1e-4),
                    momentum_target_ratio=(0.8947368421052632, 1.0),
                    step_ratio_up=0.4, cyclic=True):
    """AdamW + cyclic schedules + global-norm clipping (config :233-247)."""
    if cyclic:
        lr_sched = cyclic_cos_schedule(lr, lr_target_ratio, step_ratio_up,
                                       total_steps)
        b1_sched = cyclic_cos_schedule(betas[0], momentum_target_ratio,
                                       step_ratio_up, total_steps)
    else:
        lr_sched = lr
        b1_sched = betas[0]

    tx = optax.inject_hyperparams(
        lambda learning_rate, b1: optax.adamw(
            learning_rate=learning_rate, b1=b1, b2=betas[1],
            weight_decay=weight_decay)
    )(learning_rate=lr_sched, b1=b1_sched)

    if grad_clip is not None:
        tx = optax.chain(optax.clip_by_global_norm(grad_clip), tx)
    return tx
