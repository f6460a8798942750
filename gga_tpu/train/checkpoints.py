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


def load_variables(ckpt_dir, variables, step=None):
    """Weights-only load into a flax ``variables`` dict (no optimizer
    state needed — the inference/demo path's analog of ``load_from``).

    The checkpoint's ``params``/``batch_stats`` entries are restored
    against the given variables as the template; other collections pass
    through unchanged. Raises FileNotFoundError if the dir has no step.
    """
    mgr = _manager(ckpt_dir)
    step = step if step is not None else mgr.latest_step()
    if step is None:
        raise FileNotFoundError(f'no checkpoint found in {ckpt_dir}')
    # template-free restore (returns the full saved tree as arrays);
    # this orbax version's StandardRestore has no partial_restore, and
    # the caller has no opt_state template to offer
    restored = mgr.restore(step)
    out = dict(variables)
    for k in ('params', 'batch_stats'):
        if k in variables and k in restored:
            out[k] = jax.tree_util.tree_map(
                lambda _, r: r, variables[k], restored[k])
    return out


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
