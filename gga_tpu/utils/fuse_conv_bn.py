"""Fold BatchNorm statistics into preceding conv kernels for inference.

Rebuild of /root/reference/tools/misc/fuse_conv_bn.py (which walks torch
modules replacing Conv->BN pairs with a fused Conv). In flax the module
tree is immutable, so fusion rewrites the VARIABLES instead: wherever a
module scope owns exactly one conv-like kernel and one BatchNorm
(params scale/bias + batch_stats mean/var), the kernel's output channels
are scaled by gamma/sqrt(var+eps), the conv bias absorbs
beta - gamma*mean/sqrt(var+eps), and the BN is NEUTRALIZED in place
(mean=0, var=1-eps, scale=1, bias=0 — exact identity since BN divides
by sqrt(var+eps)). The model code runs unchanged; eval-mode outputs are
bit-for-bit the fused computation.
"""
from __future__ import annotations

import numpy as np


def _find_bn(params_child, stats_child):
    """Descend wrapper modules (e.g. BatchNorm2d_0/BatchNorm_0) to the
    dicts that hold scale/bias and mean/var. Returns (p, s) or None."""
    if not isinstance(params_child, dict) \
            or not isinstance(stats_child, dict):
        return None
    if 'scale' in params_child and 'bias' in params_child \
            and 'mean' in stats_child and 'var' in stats_child:
        return params_child, stats_child
    if len(params_child) == 1 and len(stats_child) == 1:
        (pk, pv), = params_child.items()
        (sk, sv), = stats_child.items()
        if pk == sk:
            return _find_bn(pv, sv)
    return None


def _conv_children(scope):
    out = []
    for name, child in scope.items():
        if isinstance(child, dict) and 'kernel' in child \
                and np.ndim(child['kernel']) >= 2:
            out.append(name)
    return out


def fuse_conv_bn(params, batch_stats, eps=1e-3):
    """Returns (fused_params, neutralized_batch_stats, num_fused).

    Walks parallel params/batch_stats trees; a scope fuses when it has
    exactly one conv child (a 'kernel' whose LAST axis is the channel
    dim) and one BN child present in batch_stats.
    """
    import copy

    params = copy.deepcopy(_to_py(params))
    batch_stats = copy.deepcopy(_to_py(batch_stats))
    count = _fuse_scope(params, batch_stats, eps)
    return params, batch_stats, count


def _to_py(tree):
    if isinstance(tree, dict):
        return {k: _to_py(v) for k, v in tree.items()}
    return np.asarray(tree)


def _fuse_scope(p_scope, s_scope, eps):
    count = 0
    bns = {n: _find_bn(p_scope[n], s_scope[n]) for n in list(s_scope)
           if n in p_scope}
    bn_names = [n for n, hit in bns.items() if hit is not None]
    convs = _conv_children(p_scope)
    if len(bn_names) == 1 and len(convs) == 1:
        bn_p, bn_s = bns[bn_names[0]]
        conv = p_scope[convs[0]]
        gamma = np.asarray(bn_p['scale'])
        beta = np.asarray(bn_p['bias'])
        mean = np.asarray(bn_s['mean'])
        var = np.asarray(bn_s['var'])
        k = np.asarray(conv['kernel'])
        if k.shape[-1] == gamma.shape[0]:
            scale = gamma / np.sqrt(var + eps)
            conv['kernel'] = (k * scale).astype(k.dtype)
            # additive part stays in the (otherwise-identity) BN bias so
            # the param-tree STRUCTURE never changes (a bias-less conv
            # cannot grow one). BN becomes (x - 0)/1 * 1 + bias'.
            bias = beta - mean * scale
            if 'bias' in conv:
                b_old = np.asarray(conv['bias'])
                conv['bias'] = (b_old * scale).astype(k.dtype)
            bn_p['scale'] = np.ones_like(gamma)
            bn_p['bias'] = bias.astype(beta.dtype)
            bn_s['mean'] = np.zeros_like(mean)
            bn_s['var'] = np.full_like(var, 1.0 - eps)
            count += 1
    for name, child in p_scope.items():
        if isinstance(child, dict) and name in s_scope \
                and isinstance(s_scope.get(name), dict) \
                and bns.get(name) is None:
            count += _fuse_scope(child, s_scope[name], eps)
    return count
