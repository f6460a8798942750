"""Import mmdet3d-format torch checkpoints into gga_tpu flax variables.

Counterpart of the reference's model_converters family
(/root/reference/tools/model_converters/convert_votenet_checkpoints.py:1,
convert_h3dnet_checkpoints.py:1, regnet2mmdet.py:1) with the opposite
direction of travel: instead of upgrading old torch checkpoints to new
torch checkpoints, this maps a released reference ``state_dict`` (modern
post-v0.6 key layout) onto this repo's flax parameter/batch-stats trees,
so reference-trained weights can drive decode-parity checks on TPU.

Layout conversions applied per tensor:
  - 1x1 Conv1d/Conv2d ``weight`` [O, I, 1(,1)]     -> Dense kernel [I, O]
  - BatchNorm ``weight``/``bias``                  -> bn ``scale``/``bias``
  - BatchNorm ``running_mean``/``running_var``     -> batch_stats mean/var
  - ``num_batches_tracked``                        -> dropped
  - split cls/reg prediction convs                 -> fused ``pred_out``
    (this repo predicts one fused vector per proposal and slices it;
    the reference splits the same channels across conv_cls/conv_reg —
    see vote_head.py:114 here vs the reference's BaseConvBboxHead)

No reference checkpoint ships in this offline image, so validation is a
round-trip property test: ``export_state_dict`` emits a torch-layout
dict from flax variables via the SAME rule table run backwards, and
``tests/test_tools/test_torch2flax.py`` asserts
``import(export(v)) == v`` exactly plus a live forward pass. The rule
table itself is derived from the reference module tree (SA_modules /
FP_modules / vote_module / vote_aggregation / conv_pred naming —
point_sa_module.py:290, point_fp_module.py:30, vote_module.py:80,
base_conv_bbox_head.py:54).
"""
from __future__ import annotations

import argparse
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))


def _np(x):
    """torch tensor / array-like -> float32 numpy (no torch import
    needed unless the input is a torch tensor)."""
    if hasattr(x, 'detach'):
        x = x.detach().cpu().numpy()
    return np.asarray(x)


# A rule is (torch_prefix, collection, flax_path_prefix). Each rule
# expands to the concrete tensor moves below.
_CONV_BN_MOVES = (
    # (torch_suffix, collection, flax_suffix, transform)
    ('conv.weight', 'params', 'kernel', 'conv1x1'),
    ('bn.weight', 'params', 'scale', 'copy'),
    ('bn.bias', 'params', 'bias', 'copy'),
    ('bn.running_mean', 'batch_stats', 'mean', 'copy'),
    ('bn.running_var', 'batch_stats', 'var', 'copy'),
)


def _fwd_transform(name, x):
    x = _np(x)
    if name == 'conv1x1':           # [O, I, 1(,1)] -> [I, O]
        return x.reshape(x.shape[0], x.shape[1]).T
    return x


def _bwd_transform(name, x):
    x = _np(x)
    if name == 'conv1x1':           # [I, O] -> [O, I, 1]
        return x.T[..., None]
    return x


def votenet_rules(cfg):
    """Yield (torch_key, collection, flax_path, transform) for VoteNet.

    ``flax_path`` is a '/'-joined path inside the collection. Fused
    pred_out entries are handled separately by (im|ex)port_votenet.
    """
    rules = []

    def conv_bn(torch_prefix, flax_prefix, k, child='layer{k}'):
        # SA/FP mlps and conv_pred.shared_convs name children
        # 'layer{k}' (add_module in the reference); vote_module's
        # vote_conv is a bare nn.Sequential -> numeric child names.
        ck = child.format(k=k)
        for tsuf, coll, fsuf, tr in _CONV_BN_MOVES:
            rules.append((f'{torch_prefix}.{ck}.{tsuf}', coll,
                          f'{flax_prefix}/fc{k}|bn{k}/{fsuf}', tr))

    bb = 'PointNet2SASSG_0'
    for i, chans in enumerate(cfg.sa_channels):
        for k in range(len(chans)):
            conv_bn(f'backbone.SA_modules.{i}.mlps.0',
                    f'{bb}/sa{i}/SharedMLP_0', k)
    for i, chans in enumerate(cfg.fp_channels):
        for k in range(len(chans)):
            conv_bn(f'backbone.FP_modules.{i}.mlps',
                    f'{bb}/fp{i}/SharedMLP_0', k)

    hd = 'VoteHead_0'
    for k in range(len(cfg.head.vote_conv_channels)):
        conv_bn('bbox_head.vote_module.vote_conv',
                f'{hd}/vote_mlp', k, child='{k}')
    rules.append(('bbox_head.vote_module.conv_out.weight', 'params',
                  f'{hd}/vote_out/kernel', 'conv1x1'))
    rules.append(('bbox_head.vote_module.conv_out.bias', 'params',
                  f'{hd}/vote_out/bias', 'copy'))
    for k in range(len(cfg.head.agg_mlp)):
        conv_bn('bbox_head.vote_aggregation.mlps.0',
                f'{hd}/vote_aggregation/SharedMLP_0', k)
    for k in range(len(cfg.head.pred_conv_channels)):
        conv_bn('bbox_head.conv_pred.shared_convs',
                f'{hd}/pred_shared', k)

    # resolve the fc|bn placeholder: kernel goes under fc{k},
    # scale/bias/mean/var under bn{k}
    out = []
    for tk, coll, fp, tr in rules:
        if '|' in fp:
            head_, rest = fp.rsplit('/', 1)
            fc_bn = head_.rsplit('/', 1)[-1]
            fc, bn = fc_bn.split('|')
            base = head_.rsplit('/', 1)[0]
            fp = f'{base}/{fc if rest == "kernel" else bn}/{rest}'
        out.append((tk, coll, fp, tr))
    return out


def _votenet_pred_slices(cfg):
    """Column layout of the fused pred_out vs the reference's split
    conv_cls/conv_reg (field order verified against the reference's
    PartialBinBasedBBoxCoder.split_pred)."""
    h = cfg.head
    b, s, c = h.num_dir_bins, h.num_sizes, h.num_classes
    n_reg = 3 + 2 * b + 4 * s
    # ours: [obj 2 | center 3 | dirc b | dirr b | sizec s | sizer 3s | sem c]
    return dict(n_cls=2 + c, n_reg=n_reg,
                obj=slice(0, 2), reg=slice(2, 2 + n_reg),
                sem=slice(2 + n_reg, 2 + n_reg + c))


def import_votenet(state_dict, cfg):
    """mmdet3d VoteNet state_dict -> {'params':..., 'batch_stats':...}."""
    from flax.traverse_util import unflatten_dict

    flat = {'params': {}, 'batch_stats': {}}
    used = set()
    for tk, coll, fp, tr in votenet_rules(cfg):
        if tk not in state_dict:
            raise KeyError(f'missing torch key: {tk}')
        flat[coll][tuple(fp.split('/'))] = _fwd_transform(
            tr, state_dict[tk])
        used.add(tk)

    # fused prediction head
    sl = _votenet_pred_slices(cfg)
    wc = _fwd_transform('conv1x1',
                        state_dict['bbox_head.conv_pred.conv_cls.weight'])
    wr = _fwd_transform('conv1x1',
                        state_dict['bbox_head.conv_pred.conv_reg.weight'])
    bc = _np(state_dict['bbox_head.conv_pred.conv_cls.bias'])
    br = _np(state_dict['bbox_head.conv_pred.conv_reg.bias'])
    n_out = sl['n_cls'] + sl['n_reg']
    kernel = np.zeros((wc.shape[0], n_out), wc.dtype)
    bias = np.zeros((n_out,), bc.dtype)
    kernel[:, sl['obj']], bias[sl['obj']] = wc[:, :2], bc[:2]
    kernel[:, sl['sem']], bias[sl['sem']] = wc[:, 2:], bc[2:]
    kernel[:, sl['reg']], bias[sl['reg']] = wr, br
    hd = ('VoteHead_0', 'pred_out')
    flat['params'][hd + ('kernel',)] = kernel
    flat['params'][hd + ('bias',)] = bias

    unused = [k for k in state_dict
              if k not in used and 'num_batches_tracked' not in k
              and not k.startswith('bbox_head.conv_pred.conv_')]
    if unused:
        raise KeyError(f'unmapped torch keys: {unused[:8]}')
    return {c: unflatten_dict(d) for c, d in flat.items()}


def export_votenet(variables, cfg):
    """flax variables -> mmdet3d-layout state_dict (inverse mapping,
    used by the round-trip test and to hand weights back to the
    reference stack)."""
    from flax.traverse_util import flatten_dict

    flat = {c: {'/'.join(k): v for k, v in flatten_dict(d).items()}
            for c, d in variables.items()}
    out = {}
    for tk, coll, fp, tr in votenet_rules(cfg):
        out[tk] = _bwd_transform(tr, flat[coll][fp])
        if tr == 'conv1x1' and 'SA_modules' in tk:
            out[tk] = out[tk][..., None]     # Conv2d kernel [O, I, 1, 1]

    sl = _votenet_pred_slices(cfg)
    kernel = np.asarray(flat['params']['VoteHead_0/pred_out/kernel'])
    bias = np.asarray(flat['params']['VoteHead_0/pred_out/bias'])
    wc = np.concatenate([kernel[:, sl['obj']], kernel[:, sl['sem']]], 1)
    bc = np.concatenate([bias[sl['obj']], bias[sl['sem']]])
    out['bbox_head.conv_pred.conv_cls.weight'] = wc.T[..., None]
    out['bbox_head.conv_pred.conv_cls.bias'] = bc
    out['bbox_head.conv_pred.conv_reg.weight'] = \
        kernel[:, sl['reg']].T[..., None]
    out['bbox_head.conv_pred.conv_reg.bias'] = bias[sl['reg']]
    return out


def regnet_rules(arch, strides=(1, 2, 2, 2), in_channels=64):
    """(torch_key, collection, flax_path, transform) for NoStemRegNet.

    Torch keys use the mmdet layout that regnet2mmdet.py produces
    (/root/reference/tools/model_converters/regnet2mmdet.py:23):
    ``layer{i}.{j}.conv1..3 / bn1..3 / downsample.0/1``. The stem
    (conv1/bn1) has no counterpart in the no-stem backbone and is
    skipped by the importer.
    """
    from gga_tpu.models.backbones.regnet import (REGNET_ARCHS,
                                                 generate_regnet)
    a = REGNET_ARCHS[arch]
    widths, depths, _ = generate_regnet(a['w0'], a['wa'], a['wm'],
                                        a['depth'], a['group_w'])
    rules = []
    blk = 0
    prev_w = in_channels
    for i, (w, d) in enumerate(zip(widths, depths)):
        for j in range(d):
            t = f'backbone.layer{i + 1}.{j}'
            f = f'RegNetXBlock_{blk}'
            for conv, fmod in (('conv1', 'ConvModule2d_0'),
                               ('conv3', 'ConvModule2d_1')):
                rules.append((f'{t}.{conv}.weight', 'params',
                              f'{f}/{fmod}/Conv_0/kernel', 'conv_oihw'))
            rules.append((f'{t}.conv2.weight', 'params',
                          f'{f}/Conv_0/kernel', 'conv_oihw'))
            for bn, fmod in (('bn1', 'ConvModule2d_0/BatchNorm2d_0'),
                             ('bn2', 'BatchNorm2d_0'),
                             ('bn3', 'ConvModule2d_1/BatchNorm2d_0')):
                rules += _bn_moves(f'{t}.{bn}',
                                   f'{f}/{fmod}/BatchNorm_0')
            stride = strides[i] if j == 0 else 1
            if stride != 1 or prev_w != w:
                rules.append((f'{t}.downsample.0.weight', 'params',
                              f'{f}/ConvModule2d_2/Conv_0/kernel',
                              'conv_oihw'))
                rules += _bn_moves(
                    f'{t}.downsample.1',
                    f'{f}/ConvModule2d_2/BatchNorm2d_0/BatchNorm_0')
            prev_w = w
            blk += 1
    return rules


def _bn_moves(torch_prefix, flax_prefix):
    return [(f'{torch_prefix}.weight', 'params',
             f'{flax_prefix}/scale', 'copy'),
            (f'{torch_prefix}.bias', 'params',
             f'{flax_prefix}/bias', 'copy'),
            (f'{torch_prefix}.running_mean', 'batch_stats',
             f'{flax_prefix}/mean', 'copy'),
            (f'{torch_prefix}.running_var', 'batch_stats',
             f'{flax_prefix}/var', 'copy')]


def _regnet_transform(name, x, backward=False):
    x = _np(x)
    if name == 'conv_oihw':      # torch [O, I/g, kh, kw] <-> [kh, kw, I/g, O]
        return x.transpose(2, 3, 1, 0) if not backward else \
            x.transpose(3, 2, 0, 1)
    return x


def import_regnet(state_dict, cfg):
    """mmdet-layout RegNet state_dict -> NoStemRegNet flax variables.

    cfg: dict(arch=..., strides=..., in_channels=...) or an object with
    those attributes. Stem keys (backbone.conv1/bn1) are ignored — the
    no-stem variant replaces them with the pillar scatter's 64-channel
    map (reference NoStemRegNet, mmdet3d/models/backbones/base_pointnet.py
    analog at regnet.py)."""
    from flax.traverse_util import unflatten_dict

    get = (cfg.get if isinstance(cfg, dict)
           else lambda k, d=None: getattr(cfg, k, d))
    rules = regnet_rules(get('arch', 'regnetx_400mf'),
                         tuple(get('strides', (1, 2, 2, 2))),
                         int(get('in_channels', 64)))
    flat = {'params': {}, 'batch_stats': {}}
    used = set()
    for tk, coll, fp, tr in rules:
        if tk not in state_dict:
            raise KeyError(f'missing torch key: {tk}')
        flat[coll][tuple(fp.split('/'))] = _regnet_transform(
            tr, state_dict[tk])
        used.add(tk)
    unused = [k for k in state_dict
              if k not in used and 'num_batches_tracked' not in k
              and not k.startswith(('backbone.conv1', 'backbone.bn1'))]
    if unused:
        raise KeyError(f'unmapped torch keys: {unused[:8]}')
    return {c: unflatten_dict(d) for c, d in flat.items()}


def export_regnet(variables, cfg):
    """Inverse of import_regnet (round-trip test + handing weights back
    to the torch stack)."""
    from flax.traverse_util import flatten_dict

    get = (cfg.get if isinstance(cfg, dict)
           else lambda k, d=None: getattr(cfg, k, d))
    rules = regnet_rules(get('arch', 'regnetx_400mf'),
                         tuple(get('strides', (1, 2, 2, 2))),
                         int(get('in_channels', 64)))
    flat = {c: {'/'.join(k): v for k, v in flatten_dict(d).items()}
            for c, d in variables.items()}
    return {tk: _regnet_transform(tr, flat[coll][fp], backward=True)
            for tk, coll, fp, tr in rules}


# ------------------------------------------------------------- H3DNet


def _conv_bn_rules(torch_prefix, flax_prefix, k, child='layer{k}'):
    """conv+bn ConvModule move set at child ``k`` (SharedMLP fc{k}/bn{k}
    on the flax side)."""
    ck = child.format(k=k)
    mid = f'.{ck}' if ck else ''    # child='' = a bare ConvModule
    out = []
    for tsuf, coll, fsuf, tr in _CONV_BN_MOVES:
        sub = 'fc' if fsuf == 'kernel' else 'bn'
        out.append((f'{torch_prefix}{mid}.{tsuf}', coll,
                    f'{flax_prefix}/{sub}{k}/{fsuf}', tr))
    return out


def _votehead_rules(torch_hd, flax_hd, head_cfg):
    """VoteModule + aggregation + shared pred convs of a VoteHead
    (vote_module.py:80, vote_head.py:86-91); the fused conv_cls/conv_reg
    -> pred_out move is handled by the caller."""
    rules = []
    for k in range(len(head_cfg.vote_conv_channels)):
        rules += _conv_bn_rules(f'{torch_hd}.vote_module.vote_conv',
                                f'{flax_hd}/vote_mlp', k, child='{k}')
    rules.append((f'{torch_hd}.vote_module.conv_out.weight', 'params',
                  f'{flax_hd}/vote_out/kernel', 'conv1x1'))
    rules.append((f'{torch_hd}.vote_module.conv_out.bias', 'params',
                  f'{flax_hd}/vote_out/bias', 'copy'))
    for k in range(len(head_cfg.agg_mlp)):
        rules += _conv_bn_rules(
            f'{torch_hd}.vote_aggregation.mlps.0',
            f'{flax_hd}/vote_aggregation/SharedMLP_0', k)
    for k in range(len(head_cfg.pred_conv_channels)):
        rules += _conv_bn_rules(f'{torch_hd}.conv_pred.shared_convs',
                                f'{flax_hd}/pred_shared', k)
    return rules


def h3dnet_rules(cfg):
    """(torch_key, collection, flax_path, transform) for H3DNet
    (MultiBackbone streams + rpn VoteHead + 3 primitive heads —
    convert_h3dnet_checkpoints.py's post-v0.6 key layout).

    The proposal REFINEMENT head (roi_head.bbox_head) is excluded: this
    repo's H3DBboxHead is a structural redesign (fused surface+line
    SharedMLP aggregation + residual refine_proj vs the reference's
    per-primitive matching preds + 18-way concat ModuleList,
    h3d_bbox_head.py:118-200), so its tensors have no 1:1 counterparts.
    Importing a reference checkpoint initializes everything up to the
    refinement head; the refinement head keeps its init (it is trained
    jointly in stage 2 anyway)."""
    rules = []
    bb = cfg.backbone
    for i in range(bb.num_streams):
        t = f'backbone.backbone_list.{i}'
        f = f'backbone/backbone{i}'
        for j, chans in enumerate(bb.sa_channels):
            for k in range(len(chans)):
                rules += _conv_bn_rules(f'{t}.SA_modules.{j}.mlps.0',
                                        f'{f}/sa{j}/SharedMLP_0', k)
        for j, chans in enumerate(bb.fp_channels):
            for k in range(len(chans)):
                rules += _conv_bn_rules(f'{t}.FP_modules.{j}.mlps',
                                        f'{f}/fp{j}/SharedMLP_0', k)
    rules += _conv_bn_rules('backbone.aggregation_layers',
                            'backbone/aggregation', 0)

    rules += _votehead_rules('rpn_head', 'rpn_head', cfg.rpn)

    for prim in cfg.primitives:
        t = f'roi_head.primitive_{prim.mode}'
        f = f'primitive_{prim.mode}'
        rules += _conv_bn_rules(f'{t}.flag_conv', f'{f}/flag_conv', 0,
                                child='')
        rules.append((f'{t}.flag_pred.weight', 'params',
                      f'{f}/flag_pred/kernel', 'conv1x1'))
        rules.append((f'{t}.flag_pred.bias', 'params',
                      f'{f}/flag_pred/bias', 'copy'))
        for k in range(len(prim.vote_conv_channels)):
            rules += _conv_bn_rules(f'{t}.vote_module.vote_conv',
                                    f'{f}/vote_mlp', k, child='{k}')
        rules.append((f'{t}.vote_module.conv_out.weight', 'params',
                      f'{f}/vote_out/kernel', 'conv1x1'))
        rules.append((f'{t}.vote_module.conv_out.bias', 'params',
                      f'{f}/vote_out/bias', 'copy'))
        for k in range(len(prim.agg_mlp)):
            rules += _conv_bn_rules(
                f'{t}.vote_aggregation.mlps.0',
                f'{f}/vote_aggregation/SharedMLP_0', k)
        for k in range(len(prim.feat_channels)):
            rules += _conv_bn_rules(f'{t}.conv_pred', f'{f}/conv_pred',
                                    k, child='{k}')
        rules.append((f'{t}.conv_pred.conv_out.weight', 'params',
                      f'{f}/pred_out/kernel', 'conv1x1'))
        rules.append((f'{t}.conv_pred.conv_out.bias', 'params',
                      f'{f}/pred_out/bias', 'copy'))
    return rules


def import_h3dnet(state_dict, cfg, init_variables=None):
    """mmdet3d H3DNet state_dict -> flax variables.

    init_variables: the model's init() tree; imported tensors are merged
    over it (the redesigned refinement head keeps its init — see
    h3dnet_rules). Without it, only the mapped subtree is returned."""
    from flax.traverse_util import flatten_dict, unflatten_dict

    flat = {'params': {}, 'batch_stats': {}}
    if init_variables is not None:
        for c in flat:
            flat[c] = dict(flatten_dict(init_variables[c]))
    used = set()
    for tk, coll, fp, tr in h3dnet_rules(cfg):
        if tk not in state_dict:
            raise KeyError(f'missing torch key: {tk}')
        flat[coll][tuple(fp.split('/'))] = _fwd_transform(
            tr, state_dict[tk])
        used.add(tk)

    # fused rpn prediction head (same split as votenet's conv_pred)
    sl = _votenet_pred_slices(type('C', (), {'head': cfg.rpn})())
    wc = _fwd_transform('conv1x1',
                        state_dict['rpn_head.conv_pred.conv_cls.weight'])
    wr = _fwd_transform('conv1x1',
                        state_dict['rpn_head.conv_pred.conv_reg.weight'])
    bc = _np(state_dict['rpn_head.conv_pred.conv_cls.bias'])
    br = _np(state_dict['rpn_head.conv_pred.conv_reg.bias'])
    n_out = sl['n_cls'] + sl['n_reg']
    kernel = np.zeros((wc.shape[0], n_out), wc.dtype)
    bias = np.zeros((n_out,), bc.dtype)
    kernel[:, sl['obj']], bias[sl['obj']] = wc[:, :2], bc[:2]
    kernel[:, sl['sem']], bias[sl['sem']] = wc[:, 2:], bc[2:]
    kernel[:, sl['reg']], bias[sl['reg']] = wr, br
    flat['params'][('rpn_head', 'pred_out', 'kernel')] = kernel
    flat['params'][('rpn_head', 'pred_out', 'bias')] = bias

    unused = [k for k in state_dict
              if k not in used and 'num_batches_tracked' not in k
              and not k.startswith(('roi_head.bbox_head.',
                                    'rpn_head.conv_pred.conv_'))]
    if unused:
        raise KeyError(f'unmapped torch keys: {unused[:8]}')
    return {c: unflatten_dict(d) for c, d in flat.items()}


def export_h3dnet(variables, cfg):
    """Inverse of import_h3dnet over the mapped subtree."""
    from flax.traverse_util import flatten_dict

    flat = {c: {'/'.join(k): v for k, v in flatten_dict(d).items()}
            for c, d in variables.items()}
    out = {}
    for tk, coll, fp, tr in h3dnet_rules(cfg):
        out[tk] = _bwd_transform(tr, flat[coll][fp])
        if tr == 'conv1x1' and '.SA_modules.' in tk:
            out[tk] = out[tk][..., None]     # Conv2d kernel [O, I, 1, 1]

    sl = _votenet_pred_slices(type('C', (), {'head': cfg.rpn})())
    kernel = np.asarray(flat['params']['rpn_head/pred_out/kernel'])
    bias = np.asarray(flat['params']['rpn_head/pred_out/bias'])
    wc = np.concatenate([kernel[:, sl['obj']], kernel[:, sl['sem']]], 1)
    bc = np.concatenate([bias[sl['obj']], bias[sl['sem']]])
    out['rpn_head.conv_pred.conv_cls.weight'] = wc.T[..., None]
    out['rpn_head.conv_pred.conv_cls.bias'] = bc
    out['rpn_head.conv_pred.conv_reg.weight'] = \
        kernel[:, sl['reg']].T[..., None]
    out['rpn_head.conv_pred.conv_reg.bias'] = bias[sl['reg']]
    return out


# --------------------------------------------------------------- GGA
# Flagship family: HardSimpleVFE (no params) + SparseEncoder + SECOND +
# SECONDFPN + CenterHead/CenterHead_GGA. Torch layout per the reference
# modules (sparse_encoder.py make_encoder_layers block_type='basicblock',
# second.py blocks.{s}.{3j}, second_fpn.py deblocks.{i}, and
# centerpoint_head_gga.py shared_conv/task_heads).


def _gga_transform(name, x, backward=False):
    x = _np(x)
    if name.startswith('sparse3d'):
        # torch spconv2 [O, D, H, W, I] (released GGA checkpoints) or
        # mmcv-spconv1 [D, H, W, I, O] <-> flax [K, I, O]; offset id
        # k = d*(H*W) + h*W + w matches the row-major (D, H, W) flatten.
        _, i_ch, o_ch = name.split(':')
        i_ch, o_ch = int(i_ch), int(o_ch)
        if backward:                      # [K, I, O] -> spconv2 layout
            k = x.shape[0]
            dhw = (3, 1, 1) if k == 3 else (3, 3, 3)
            return x.reshape(*dhw, i_ch, o_ch).transpose(4, 0, 1, 2, 3)
        if x.ndim == 5:
            if x.shape[3:] == (i_ch, o_ch):       # spconv1 (D,H,W,I,O)
                pass
            elif x.shape[0] == o_ch and x.shape[-1] == i_ch:
                x = x.transpose(1, 2, 3, 4, 0)    # spconv2 -> spconv1
            else:
                raise ValueError(f'{name}: unrecognized sparse conv '
                                 f'weight shape {x.shape}')
        assert x.shape[-2:] == (i_ch, o_ch), (name, x.shape)
        return x.reshape(-1, i_ch, o_ch)
    if name == 'conv2d':                  # [O, I, kh, kw] <-> [kh, kw, I, O]
        return x.transpose(3, 2, 0, 1) if backward else \
            x.transpose(2, 3, 1, 0)
    if name == 'deconv2d':
        # torch ConvTranspose2d [I, O, kh, kw] <-> flax ConvTranspose
        # kernel [kh, kw, I, O] with SPATIAL FLIP (verified numerically:
        # flax conv_transpose correlates, torch deconv convolves)
        if backward:
            return np.ascontiguousarray(
                x[::-1, ::-1].transpose(2, 3, 0, 1))
        return np.ascontiguousarray(x.transpose(2, 3, 0, 1)[::-1, ::-1])
    return x


def gga_rules(cfg):
    """(torch_key, collection, flax_path, transform) for the GGA /
    CenterPoint-KITTI flagship (state_dict prefixes pts_middle_encoder /
    pts_backbone / pts_neck / pts_bbox_head; pts_voxel_encoder
    HardSimpleVFE has no parameters)."""
    rules = []

    def bn(torch_prefix, flax_prefix):
        rules.extend(_bn_moves(torch_prefix, flax_prefix))

    # ---- SparseEncoder -------------------------------------------------
    enc = 'SparseEncoder_0'
    me = 'pts_middle_encoder'
    in_ch = 4
    base = cfg.encoder_channels[0][0]
    rules.append((f'{me}.conv_input.0.weight', 'params',
                  f'{enc}/SubMConv3dMapped_0/kernel',
                  f'sparse3d:{in_ch}:{base}'))
    bn(f'{me}.conv_input.1', f'{enc}/MaskedBatchNorm_0')

    n_bb = 0
    n_sc = 0
    ch = base
    for i, blocks in enumerate(cfg.encoder_channels):
        layer = f'{me}.encoder_layers.encoder_layer{i + 1}'
        for j, out_ch in enumerate(blocks):
            last = j == len(blocks) - 1
            if last and i != len(cfg.encoder_channels) - 1:
                # strided SparseConvModule: Sequential(conv, bn, relu)
                f = f'{enc}/SparseConvBlock_{n_sc}'
                rules.append((f'{layer}.{j}.0.weight', 'params',
                              f'{f}/SparseConv3d_0/kernel',
                              f'sparse3d:{ch}:{out_ch}'))
                bn(f'{layer}.{j}.1', f'{f}/MaskedBatchNorm_0')
                n_sc += 1
            else:
                f = f'{enc}/SparseBasicBlock_{n_bb}'
                rules.append((f'{layer}.{j}.conv1.weight', 'params',
                              f'{f}/SubMConv3dMapped_0/kernel',
                              f'sparse3d:{ch}:{out_ch}'))
                bn(f'{layer}.{j}.bn1', f'{f}/MaskedBatchNorm_0')
                rules.append((f'{layer}.{j}.conv2.weight', 'params',
                              f'{f}/SubMConv3dMapped_1/kernel',
                              f'sparse3d:{out_ch}:{out_ch}'))
                bn(f'{layer}.{j}.bn2', f'{f}/MaskedBatchNorm_1')
                n_bb += 1
            ch = out_ch
    # conv_out: kernel (3, 1, 1) stride (2, 1, 1)
    rules.append((f'{me}.conv_out.0.weight', 'params',
                  f'{enc}/SparseConvBlock_{n_sc}/SparseConv3d_0/kernel',
                  f'sparse3d:{ch}:{cfg.encoder_out_channels}'))
    bn(f'{me}.conv_out.1',
       f'{enc}/SparseConvBlock_{n_sc}/MaskedBatchNorm_0')

    # ---- SECOND backbone ------------------------------------------------
    cm = 0
    for s, num in enumerate(cfg.backbone_layers):
        for j in range(num + 1):          # stride conv + num subsequent
            t = f'pts_backbone.blocks.{s}.{3 * j}'
            f = f'SECOND_0/ConvModule2d_{cm}'
            rules.append((f'{t}.weight', 'params',
                          f'{f}/Conv_0/kernel', 'conv2d'))
            bn(f'pts_backbone.blocks.{s}.{3 * j + 1}',
               f'{f}/BatchNorm2d_0/BatchNorm_0')
            cm += 1

    # ---- SECONDFPN ------------------------------------------------------
    n_conv = n_dec = 0
    for i, stride in enumerate(cfg.neck_strides):
        t = f'pts_neck.deblocks.{i}'
        if stride > 1:
            rules.append((f'{t}.0.weight', 'params',
                          f'SECONDFPN_0/ConvTranspose_{n_dec}/kernel',
                          'deconv2d'))
            n_dec += 1
        else:
            rules.append((f'{t}.0.weight', 'params',
                          f'SECONDFPN_0/Conv_{n_conv}/kernel', 'conv2d'))
            n_conv += 1
        bn(f'{t}.1', f'SECONDFPN_0/BatchNorm2d_{i}/BatchNorm_0')

    # ---- CenterHead -----------------------------------------------------
    hd = 'CenterHead_0'
    bh = 'pts_bbox_head'
    rules.append((f'{bh}.shared_conv.conv.weight', 'params',
                  f'{hd}/ConvModule2d_0/Conv_0/kernel', 'conv2d'))
    rules.append((f'{bh}.shared_conv.conv.bias', 'params',
                  f'{hd}/ConvModule2d_0/Conv_0/bias', 'copy'))
    bn(f'{bh}.shared_conv.bn', f'{hd}/ConvModule2d_0/BatchNorm2d_0'
                               '/BatchNorm_0')
    branches = ['reg', 'height', 'dim', 'rot']   # SeparateHead dict order
    for t, num_cls in enumerate(cfg.tasks):
        for b_i, name in enumerate(branches + ['heatmap']):
            tb = f'{bh}.task_heads.{t}.{name}'
            fb = f'{hd}/task{t}'
            # (num_conv - 1) = 1 ConvModule then the final conv
            rules.append((f'{tb}.0.conv.weight', 'params',
                          f'{fb}/ConvModule2d_{b_i}/Conv_0/kernel',
                          'conv2d'))
            rules.append((f'{tb}.0.conv.bias', 'params',
                          f'{fb}/ConvModule2d_{b_i}/Conv_0/bias', 'copy'))
            bn(f'{tb}.0.bn',
               f'{fb}/ConvModule2d_{b_i}/BatchNorm2d_0/BatchNorm_0')
            rules.append((f'{tb}.1.weight', 'params',
                          f'{fb}/{name}_out/kernel', 'conv2d'))
            rules.append((f'{tb}.1.bias', 'params',
                          f'{fb}/{name}_out/bias', 'copy'))
    return rules


def import_gga(state_dict, cfg):
    """mmdet3d GGA/CenterPoint state_dict -> GGADetector flax variables.

    The head branch ConvModules carry conv biases here but not in the
    reference (bias='auto' with BN); absent torch keys for those biases
    are tolerated and left at zero."""
    from flax.traverse_util import unflatten_dict

    flat = {'params': {}, 'batch_stats': {}}
    used = set()
    for tk, coll, fp, tr in gga_rules(cfg):
        if tk not in state_dict:
            if tk.endswith('.conv.bias'):
                continue                   # reference convs are bias-free
            raise KeyError(f'missing torch key: {tk}')
        flat[coll][tuple(fp.split('/'))] = _gga_transform(
            tr, state_dict[tk])
        used.add(tk)
    unused = [k for k in state_dict
              if k not in used and 'num_batches_tracked' not in k]
    if unused:
        raise KeyError(f'unmapped torch keys: {unused[:8]}')
    return {c: unflatten_dict(d) for c, d in flat.items()}


def export_gga(variables, cfg):
    """Inverse of import_gga (spconv2 sparse layout)."""
    from flax.traverse_util import flatten_dict

    flat = {c: {'/'.join(k): v for k, v in flatten_dict(d).items()}
            for c, d in variables.items()}
    out = {}
    for tk, coll, fp, tr in gga_rules(cfg):
        if fp not in flat[coll]:
            continue
        out[tk] = _gga_transform(tr, flat[coll][fp], backward=True)
    return out


FAMILIES = {'votenet': (import_votenet, export_votenet),
            'regnet': (import_regnet, export_regnet),
            'gga': (import_gga, export_gga),
            'h3dnet': (import_h3dnet, export_h3dnet)}


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument('checkpoint', help='.pth (torch.load-able) or .pkl '
                    'holding a state_dict or {"state_dict": ...}')
    ap.add_argument('--family', default='votenet', choices=FAMILIES)
    ap.add_argument('--arch', default='regnetx_400mf',
                    help='regnet family: the pycls arch name')
    ap.add_argument('--out', required=True,
                    help='output .pkl of flax variables')
    args = ap.parse_args()

    if args.checkpoint.endswith('.pkl'):
        with open(args.checkpoint, 'rb') as f:
            ckpt = pickle.load(f)
    else:
        import torch
        ckpt = torch.load(args.checkpoint, map_location='cpu')
    sd = ckpt.get('state_dict', ckpt)

    if args.family == 'votenet':
        from gga_tpu.models.detectors.votenet import VoteNetConfig
        cfg = VoteNetConfig()
    elif args.family == 'regnet':
        cfg = dict(arch=args.arch, strides=(1, 2, 2, 2), in_channels=64)
    elif args.family == 'gga':
        from gga_tpu.models.detectors.centerpoint_gga import GGAModelConfig
        cfg = GGAModelConfig()
    elif args.family == 'h3dnet':
        from gga_tpu.models.detectors.h3dnet import H3DNetConfig
        cfg = H3DNetConfig()
    if args.family == 'h3dnet':
        import jax

        # conversion is pure host work; never route the init through
        # the (slow, possibly remote) TPU backend
        jax.config.update('jax_platforms', 'cpu')
        from gga_tpu.models.detectors.h3dnet import H3DNet
        # init supplies the redesigned refinement head (unmapped — see
        # h3dnet_rules); the mapped subtree is overwritten by the import
        init_v = H3DNet(cfg).init(
            jax.random.PRNGKey(0), np.zeros((1, 256, 4), np.float32),
            np.ones((1, 256), bool), train=False)
        variables = import_h3dnet(sd, cfg, init_variables=init_v)
    else:
        variables = FAMILIES[args.family][0](sd, cfg)
    with open(args.out, 'wb') as f:
        pickle.dump(variables, f)
    n = sum(np.asarray(v).size for c in variables.values()
            for v in _flatten_leaves(c))
    print(f'wrote {args.out}: {n} parameters')


def _flatten_leaves(tree):
    from flax.traverse_util import flatten_dict
    return flatten_dict(tree).values()


if __name__ == '__main__':
    main()
