"""Orbax checkpointing with the reference's two load semantics:
``resume_from`` (params + opt state + step) vs ``load_from`` (weights only)
(/root/reference/mmdet3d/apis/train.py:317-320), plus auto-resume from the
latest checkpoint (apis/train.py:310-315).
"""
from __future__ import annotations

import os

import jax
import orbax.checkpoint as ocp


def _manager(ckpt_dir, max_to_keep=5):
    return ocp.CheckpointManager(
        os.path.abspath(os.path.expanduser(ckpt_dir)),
        options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep,
                                             create=True))


def save_checkpoint(ckpt_dir, state, step=None, max_to_keep=5):
    """Save params/batch_stats/opt_state/step."""
    mgr = _manager(ckpt_dir, max_to_keep)
    payload = dict(params=state.params, batch_stats=state.batch_stats,
                   opt_state=state.opt_state, step=state.step)
    mgr.save(int(step if step is not None else state.step),
             args=ocp.args.StandardSave(payload))
    mgr.wait_until_finished()
    return mgr.latest_step()


def latest_step(ckpt_dir):
    try:
        return _manager(ckpt_dir).latest_step()
    except FileNotFoundError:
        return None


def resume_from(ckpt_dir, state, step=None):
    """Full resume (optimizer + step)."""
    mgr = _manager(ckpt_dir)
    step = step if step is not None else mgr.latest_step()
    if step is None:
        return state, False
    template = dict(params=state.params, batch_stats=state.batch_stats,
                    opt_state=state.opt_state, step=state.step)
    restored = mgr.restore(step, args=ocp.args.StandardRestore(template))
    return state.replace(**restored), True


def load_from(ckpt_dir, state, step=None):
    """Weights-only load (fresh optimizer/step)."""
    mgr = _manager(ckpt_dir)
    step = step if step is not None else mgr.latest_step()
    if step is None:
        return state, False
    template = dict(params=state.params, batch_stats=state.batch_stats,
                    opt_state=state.opt_state, step=state.step)
    restored = mgr.restore(step, args=ocp.args.StandardRestore(template))
    return state.replace(params=restored['params'],
                         batch_stats=restored['batch_stats']), True
