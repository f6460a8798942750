"""Config-dict -> detector construction through the MODELS registry.

The behavioral mirror of the reference's registry-built models
(/root/reference/mmdet3d/models/builder.py: ``build_model`` resolves
``cfg.model.type`` in the DETECTORS registry). Here every detector family
keeps its typed frozen-dataclass config; this module converts the python
config-file dict into that dataclass (recursively, lists -> tuples,
nested dicts -> nested config dataclasses merged over the field default)
and registers one builder per family.

Contract: ``MODELS.get(type)(cfg)`` takes the FULL file-level Config and
returns ``(model, model_cfg)`` where ``model`` is a flax module and
``model_cfg`` its frozen dataclass config.
"""
from __future__ import annotations

import dataclasses

from ..config import MODELS
from .dense_heads.centerpoint_head_gga import GGAHeadConfig
from .detectors.centerpoint import CenterPointConfig, CenterPointDetector
from .detectors.centerpoint_gga import GGADetector, GGAModelConfig
from .detectors.dynamic_voxelnet import (DVSECONDConfig,
                                         DVSECONDDetector,
                                         DynamicVoxelNet,
                                         DynamicVoxelNetConfig)
from .detectors.fcaf3d import FCAF3DDetector, FCAF3DModelConfig
from .detectors.groupfree3d import GroupFree3DNet, GroupFree3DNetConfig
from .detectors.h3dnet import H3DNet, H3DNetConfig
from .detectors.imvotenet import ImVoteNet, ImVoteNetConfig
from .detectors.imvoxelnet import (ImVoxelNet, ImVoxelNetConfig,
                                   ImVoxelNetIndoor,
                                   ImVoxelNetIndoorConfig)
from .detectors.mask_rcnn import MaskRCNN, MaskRCNNConfig
from .detectors.monoflex import MonoFlexDetector, MonoFlexModelConfig
from .detectors.mvxnet import MVXNet, MVXNetConfig
from .detectors.parta2 import PartA2Config, PartA2Detector
from .detectors.point_rcnn import PointRCNNConfig, PointRCNNDetector
from .detectors.pgd import PGDDetector, PGDModelConfig
from .detectors.sassd import SASSD, SASSDConfig
from .detectors.ssd3d import SSD3DNet, SSD3DNetConfig
from .detectors.smoke import SMOKEDetector, SMOKEModelConfig
from .detectors.votenet import VoteNet, VoteNetConfig
from .detectors.ssn import SSNConfig, SSNDetector
from .detectors.voxelnet import (FreeAnchorPointPillarsConfig,
                                 PointPillars, PointPillarsConfig,
                                 SECONDDetector, SECONDNetConfig)
from .backbones.dgcnn import DGCNNConfig, DGCNNSegmentor
from .backbones.paconv import PAConvConfig, PAConvSegmentor
from .segmentors.encoder_decoder import (EncoderDecoder3D,
                                         EncoderDecoder3DConfig)


def _tuplify(v):
    if isinstance(v, (list, tuple)):
        return tuple(_tuplify(x) for x in v)
    return v


def config_from_dict(cfg_cls, d, base=None):
    """Build a frozen dataclass config from a plain dict.

    - unknown keys raise (catches config typos, like the registry's
      strict ``**cfg`` expansion in the reference builder);
    - lists become (nested) tuples so configs stay hashable/static;
    - a dict value for a dataclass-typed field is merged OVER the
      field's default instance (partial head dicts work).
    """
    base = cfg_cls() if base is None else base
    fields = {f.name for f in dataclasses.fields(cfg_cls)}
    kwargs = {}
    for k, v in d.items():
        if k == 'type':
            continue
        if k not in fields:
            raise KeyError(
                f'{cfg_cls.__name__} has no field {k!r}; '
                f'known: {sorted(fields)}')
        cur = getattr(base, k)
        if dataclasses.is_dataclass(cur) and isinstance(v, dict):
            kwargs[k] = config_from_dict(type(cur), v, base=cur)
        elif (isinstance(cur, tuple) and cur
              and dataclasses.is_dataclass(cur[0])
              and isinstance(v, (list, tuple))
              and all(isinstance(x, dict) for x in v)):
            # tuple-of-dataclass field (e.g. ShapeAwareConfig.tasks):
            # each dict builds an element of the default's element type
            # (constructed directly — element classes may have
            # no-default fields)
            elem_cls = type(cur[0])
            kwargs[k] = tuple(
                elem_cls(**{ek: _tuplify(ev) for ek, ev in x.items()})
                for x in v)
        else:
            kwargs[k] = _tuplify(v)
    return dataclasses.replace(base, **kwargs)


def _register_family(name, cfg_cls, model_cls):
    @MODELS.register(name=name)
    def _build(cfg):
        mc = config_from_dict(cfg_cls, dict(cfg['model']))
        return model_cls(mc), mc
    _build.__name__ = f'build_{name}'
    return _build


_register_family('PointPillars', PointPillarsConfig, PointPillars)
_register_family('FreeAnchorPointPillars', FreeAnchorPointPillarsConfig,
                 PointPillars)
_register_family('SSNDetector', SSNConfig, SSNDetector)
_register_family('SECONDDetector', SECONDNetConfig, SECONDDetector)
_register_family('DVSECONDDetector', DVSECONDConfig, DVSECONDDetector)
_register_family('DynamicVoxelNet', DynamicVoxelNetConfig, DynamicVoxelNet)
_register_family('SASSD', SASSDConfig, SASSD)
_register_family('MVXNet', MVXNetConfig, MVXNet)
_register_family('ImVoxelNet', ImVoxelNetConfig, ImVoxelNet)
_register_family('ImVoxelNetIndoor', ImVoxelNetIndoorConfig,
                 ImVoxelNetIndoor)
_register_family('SMOKEDetector', SMOKEModelConfig, SMOKEDetector)
_register_family('PGDDetector', PGDModelConfig, PGDDetector)
_register_family('VoteNet', VoteNetConfig, VoteNet)
_register_family('FCAF3DDetector', FCAF3DModelConfig, FCAF3DDetector)
_register_family('PartA2Detector', PartA2Config, PartA2Detector)
_register_family('PointRCNNDetector', PointRCNNConfig, PointRCNNDetector)
_register_family('SSD3DNet', SSD3DNetConfig, SSD3DNet)
_register_family('MonoFlexDetector', MonoFlexModelConfig, MonoFlexDetector)
_register_family('MaskRCNN', MaskRCNNConfig, MaskRCNN)
_register_family('CenterPointDetector', CenterPointConfig, CenterPointDetector)
_register_family('ImVoteNet', ImVoteNetConfig, ImVoteNet)
_register_family('GroupFree3DNet', GroupFree3DNetConfig, GroupFree3DNet)
_register_family('H3DNet', H3DNetConfig, H3DNet)
_register_family('EncoderDecoder3D', EncoderDecoder3DConfig,
                 EncoderDecoder3D)
_register_family('DGCNNSegmentor', DGCNNConfig, DGCNNSegmentor)
_register_family('PAConvSegmentor', PAConvConfig, PAConvSegmentor)


@MODELS.register(name='GGADetector')
def _build_gga(cfg):
    """GGA config files keep ``head`` and ``test_cfg`` as top-level
    blocks (mirroring the reference's train_cfg/test_cfg split at
    /root/reference/configs/gga/gga_kitti_config.py:63-91)."""
    d = {k: v for k, v in cfg['model'].items() if k != 'type'}
    if 'head' in cfg:
        d['head'] = config_from_dict(GGAHeadConfig, dict(cfg['head']))
    for k in ('max_per_task', 'score_threshold', 'nms_thr',
              'post_max_size'):
        if 'test_cfg' in cfg and k in cfg['test_cfg']:
            d[k] = cfg['test_cfg'][k]
    mc = config_from_dict(GGAModelConfig, d)
    return GGADetector(mc), mc


def build_detector(cfg):
    """Full file-level Config -> (flax model, frozen dataclass config)."""
    typ = cfg['model'].get('type')
    if typ is None:
        raise KeyError('cfg.model has no "type" key')
    return MODELS.get(typ)(cfg)
