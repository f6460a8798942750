"""Round-trip test of the torch<->flax VoteNet checkpoint mapping.

No reference checkpoint ships in this offline image, so the importer is
validated by the inverse property: exporting flax variables to the
mmdet3d key/layout convention and importing them back must reproduce the
tree exactly, and the imported tree must drive a real forward pass.
The export side doubles as a key-name contract — it enumerates exactly
the state_dict keys a released reference VoteNet checkpoint carries
(convert_votenet_checkpoints.py RENAME_PREFIX targets).
"""
import sys
from pathlib import Path

import jax
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[2] / 'tools'))

from model_converters.torch2flax import (export_votenet,  # noqa: E402
                                         import_votenet)


def _tiny_votenet():
    from gga_tpu.models.detectors.votenet import VoteNet, VoteNetConfig
    cfg = VoteNetConfig.tiny()
    model = VoteNet(cfg)
    pts = np.random.RandomState(0).randn(1, 256, 4).astype(np.float32)
    valid = np.ones((1, 256), bool)
    variables = model.init(jax.random.PRNGKey(0), pts, valid,
                           train=False)
    return cfg, model, variables, pts, valid


def test_votenet_roundtrip_exact():
    cfg, model, variables, pts, valid = _tiny_votenet()
    sd = export_votenet(variables, cfg)

    # every key follows the reference naming convention
    for k in sd:
        assert k.startswith(('backbone.SA_modules.',
                             'backbone.FP_modules.',
                             'bbox_head.vote_module.',
                             'bbox_head.vote_aggregation.',
                             'bbox_head.conv_pred.')), k
    # conv weights carry the torch layout (O, I, 1[, 1])
    w_sa = sd['backbone.SA_modules.0.mlps.0.layer0.conv.weight']
    assert w_sa.ndim == 4 and w_sa.shape[2:] == (1, 1)
    w_cls = sd['bbox_head.conv_pred.conv_cls.weight']
    assert w_cls.shape[0] == 2 + cfg.head.num_classes

    back = import_votenet(sd, cfg)
    flat_a = jax.tree_util.tree_leaves_with_path(variables)
    flat_b = jax.tree_util.tree_leaves_with_path(back)
    assert len(flat_a) == len(flat_b)
    for (pa, va), (pb, vb) in zip(sorted(flat_a, key=lambda t: str(t[0])),
                                  sorted(flat_b, key=lambda t: str(t[0]))):
        assert str(pa) == str(pb)
        np.testing.assert_array_equal(np.asarray(va), np.asarray(vb))


def test_votenet_imported_forward_runs():
    cfg, model, variables, pts, valid = _tiny_votenet()
    back = import_votenet(export_votenet(variables, cfg), cfg)
    out_a = model.apply(variables, pts, valid, train=False)
    out_b = model.apply(back, pts, valid, train=False)
    la, lb = jax.tree_util.tree_leaves(out_a), jax.tree_util.tree_leaves(
        out_b)
    for a, b in zip(la, lb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=0)


def test_votenet_import_rejects_missing_keys():
    cfg, model, variables, *_ = _tiny_votenet()
    sd = export_votenet(variables, cfg)
    sd.pop('bbox_head.vote_module.conv_out.weight')
    try:
        import_votenet(sd, cfg)
    except KeyError as e:
        assert 'conv_out' in str(e)
    else:
        raise AssertionError('expected KeyError on missing torch key')


def _regnet():
    import jax.numpy as jnp

    from gga_tpu.models.backbones.regnet import NoStemRegNet
    model = NoStemRegNet(arch='regnetx_400mf')
    x = jnp.asarray(np.random.RandomState(1).randn(1, 16, 16, 64),
                    jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    cfg = dict(arch='regnetx_400mf', strides=(1, 2, 2, 2), in_channels=64)
    return cfg, model, variables, x


def test_regnet_roundtrip_exact():
    from model_converters.torch2flax import export_regnet, import_regnet
    cfg, model, variables, x = _regnet()
    sd = export_regnet(variables, cfg)
    # regnet2mmdet.py output convention: layer{i}.{j}.conv/bn/downsample
    for k in sd:
        assert k.startswith('backbone.layer'), k
    w = sd['backbone.layer1.0.conv2.weight']
    assert w.ndim == 4 and w.shape[2:] == (3, 3)   # torch OIHW
    back = import_regnet(sd, cfg)
    flat_a = jax.tree_util.tree_leaves_with_path(variables)
    flat_b = jax.tree_util.tree_leaves_with_path(back)
    assert len(flat_a) == len(flat_b)
    for (pa, va), (pb, vb) in zip(sorted(flat_a, key=lambda t: str(t[0])),
                                  sorted(flat_b, key=lambda t: str(t[0]))):
        assert str(pa) == str(pb)
        np.testing.assert_array_equal(np.asarray(va), np.asarray(vb))


def test_regnet_imported_forward_runs():
    from model_converters.torch2flax import export_regnet, import_regnet
    cfg, model, variables, x = _regnet()
    back = import_regnet(export_regnet(variables, cfg), cfg)
    out_a = model.apply(variables, x, train=False)
    out_b = model.apply(back, x, train=False)
    for a, b in zip(jax.tree_util.tree_leaves(out_a),
                    jax.tree_util.tree_leaves(out_b)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


# --------------------------------------------------------------- H3DNet

def _tiny_h3dnet():
    from gga_tpu.models.detectors.h3dnet import H3DNet, H3DNetConfig
    cfg = H3DNetConfig.tiny()
    model = H3DNet(cfg)
    pts = np.random.RandomState(0).randn(1, 256, 4).astype(np.float32)
    valid = np.ones((1, 256), bool)
    variables = model.init(jax.random.PRNGKey(0), pts, valid, train=False)
    return cfg, model, variables, pts, valid


def test_h3dnet_roundtrip_exact():
    from model_converters.torch2flax import export_h3dnet, import_h3dnet

    cfg, model, variables, *_ = _tiny_h3dnet()
    sd = export_h3dnet(variables, cfg)

    # every key follows the reference H3DNet naming convention
    # (TwoStage3DDetector: rpn_head + roi_head.primitive_{z,xy,line};
    # the redesigned refinement head roi_head.bbox_head is excluded)
    for k in sd:
        assert k.startswith(('backbone.backbone_list.',
                             'backbone.aggregation_layers.',
                             'rpn_head.', 'roi_head.primitive_')), k
    # a bare ConvModule has no child index (flag_conv.conv.weight)
    assert 'roi_head.primitive_z.flag_conv.conv.weight' in sd
    # primitive conv_pred is a bare Sequential -> numeric children
    assert 'roi_head.primitive_z.conv_pred.0.conv.weight' in sd
    w_sa = sd['backbone.backbone_list.0.SA_modules.0.mlps.0'
              '.layer0.conv.weight']
    assert w_sa.ndim == 4 and w_sa.shape[2:] == (1, 1)

    back = import_h3dnet(sd, cfg, init_variables=variables)
    # merged over the init tree, the round trip reproduces it exactly
    # (mapped subtree from sd, refinement head untouched from init)
    _tree_equal({k: variables[k] for k in ('params', 'batch_stats')},
                back)


def test_h3dnet_imported_forward_runs():
    from model_converters.torch2flax import export_h3dnet, import_h3dnet

    cfg, model, variables, pts, valid = _tiny_h3dnet()
    back = import_h3dnet(export_h3dnet(variables, cfg), cfg,
                         init_variables=variables)
    out_a = model.apply(variables, pts, valid, train=False)
    out_b = model.apply(back, pts, valid, train=False)
    for a, b in zip(jax.tree_util.tree_leaves(out_a),
                    jax.tree_util.tree_leaves(out_b)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_h3dnet_import_rejects_missing_keys():
    from model_converters.torch2flax import export_h3dnet, import_h3dnet

    cfg, model, variables, *_ = _tiny_h3dnet()
    sd = export_h3dnet(variables, cfg)
    sd.pop('rpn_head.vote_module.conv_out.weight')
    try:
        import_h3dnet(sd, cfg, init_variables=variables)
    except KeyError as e:
        assert 'conv_out' in str(e)
    else:
        raise AssertionError('expected KeyError on missing torch key')


# ------------------------------------------------------------------ GGA

def _tiny_gga():
    from gga_tpu.models.detectors.centerpoint_gga import (GGADetector,
                                                          GGAModelConfig)
    cfg = GGAModelConfig.tiny()
    model = GGADetector(cfg)
    pts = np.random.RandomState(0).rand(1, 256, 4).astype(np.float32) \
        * np.asarray([60, 20, 2, 1], np.float32) \
        - np.asarray([0, 10, 2.5, 0], np.float32)
    valid = np.ones((1, 256), bool)
    variables = model.init(jax.random.PRNGKey(0), pts, valid, train=False)
    return cfg, model, variables, pts, valid


def _tree_equal(a, b):
    fa = jax.tree_util.tree_leaves_with_path(a)
    fb = {tuple(str(k) for k in p): v
          for p, v in jax.tree_util.tree_leaves_with_path(b)}
    assert len(fa) == len(fb)
    for p, v in fa:
        key = tuple(str(k) for k in p)
        np.testing.assert_array_equal(np.asarray(v), np.asarray(fb[key]),
                                      err_msg=str(key))


def test_gga_roundtrip_exact():
    from model_converters.torch2flax import export_gga, import_gga

    cfg, model, variables, pts, valid = _tiny_gga()
    src = {k: variables[k] for k in ('params', 'batch_stats')}
    sd = export_gga(src, cfg)

    for k in sd:
        assert k.startswith(('pts_middle_encoder.', 'pts_backbone.',
                             'pts_neck.', 'pts_bbox_head.')), k
    # sparse conv weights carry the spconv2 torch layout (O, D, H, W, I)
    w_in = sd['pts_middle_encoder.conv_input.0.weight']
    assert w_in.ndim == 5 and w_in.shape[1:4] == (3, 3, 3)
    assert w_in.shape[-1] == 4
    w_out = sd['pts_middle_encoder.conv_out.0.weight']
    assert w_out.shape[1:4] == (3, 1, 1)

    back = import_gga(sd, cfg)
    _tree_equal(src, back)

    # spconv1 (mmcv) layout imports identically
    sd1 = {k: (v.transpose(1, 2, 3, 4, 0)
               if hasattr(v, 'ndim') and v.ndim == 5 else v)
           for k, v in sd.items()}
    back1 = import_gga(sd1, cfg)
    _tree_equal(src, back1)

    # the imported tree drives a real forward pass
    v2 = dict(variables)
    v2.update(back)
    preds = model.apply(v2, pts, valid, train=False)
    assert np.isfinite(np.asarray(preds[0]['heatmap'])).all()
