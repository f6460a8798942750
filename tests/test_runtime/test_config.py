"""Config-zoo sweep: every config under configs/ must parse and (when it
declares a model) build through the MODELS registry.

Mirror of the reference's sanity sweep at
/root/reference/tests/test_runtime/test_config.py:1 (builds every config
in configs/). Model construction is cheap in flax (no params until
init), so the sweep validates the full config -> dataclass conversion
for every family without compiling anything.
"""
import dataclasses
import glob
import os

import flax.linen as nn
import pytest

from gga_tpu.config import MODELS, Config
from gga_tpu.models.builder import build_detector, config_from_dict

REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
ALL_CONFIGS = sorted(
    p for p in glob.glob(os.path.join(REPO, 'configs', '**', '*.py'),
                         recursive=True)
    if '_base_' not in p)
assert len(ALL_CONFIGS) >= 14, ALL_CONFIGS


@pytest.mark.parametrize(
    'path', ALL_CONFIGS, ids=[os.path.basename(p) for p in ALL_CONFIGS])
def test_config_builds(path):
    cfg = Config.fromfile(path)
    assert 'model' in cfg and 'type' in cfg.model, path
    model, model_cfg = build_detector(cfg)
    assert isinstance(model, nn.Module)
    assert dataclasses.is_dataclass(model_cfg)
    # configs must produce hashable (static) dataclass configs
    hash(model_cfg)


def test_every_registered_family_has_a_config():
    built = set()
    for path in ALL_CONFIGS:
        cfg = Config.fromfile(path)
        built.add(cfg.model.type)
    missing = set(MODELS._items) - built
    assert not missing, f'registered families without a config: {missing}'


def test_unknown_model_field_raises():
    from gga_tpu.models.detectors.voxelnet import PointPillarsConfig
    with pytest.raises(KeyError, match='no field'):
        config_from_dict(PointPillarsConfig, {'not_a_field': 1})


def test_nested_head_dict_merges_over_default():
    from gga_tpu.models.detectors.voxelnet import SECONDNetConfig
    mc = config_from_dict(SECONDNetConfig, {'head': {'feat_channels': 64}})
    assert mc.head.feat_channels == 64
    # untouched nested fields keep the family-specific default
    assert mc.head.anchor_ranges[2][2] == -1.78


def test_delete_replaces_subtree():
    cfg = Config.fromfile(os.path.join(
        REPO, 'configs/_base_/datasets/kitti-3d-car.py'))
    assert list(cfg.data.db_sampler.sample_groups) == ['Car']
    assert cfg.class_names == ['Car']
    # non-deleted keys still inherit
    assert cfg.data.pts_prefix == 'velodyne_reduced'
