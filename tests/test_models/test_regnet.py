"""NoStemRegNet backbone + the regnet/free_anchor/ssn detector shells."""
import jax
import jax.numpy as jnp
import numpy as np

from gga_tpu.models.backbones.regnet import (NoStemRegNet, REGNET_ARCHS,
                                             generate_regnet)


def test_generate_regnet_matches_published_zoo():
    """Stage widths/depths of the public RegNetX models (pycls zoo)."""
    expect = {
        'regnetx_400mf': ((32, 64, 160, 384), (1, 2, 7, 12)),
        'regnetx_800mf': ((64, 128, 288, 672), (1, 3, 7, 5)),
        'regnetx_1.6gf': ((72, 168, 408, 912), (2, 4, 10, 2)),
        'regnetx_3.2gf': ((96, 192, 432, 1008), (2, 6, 15, 2)),
    }
    for name, (widths, depths) in expect.items():
        a = REGNET_ARCHS[name]
        w, d, g = generate_regnet(a['w0'], a['wa'], a['wm'], a['depth'],
                                  a['group_w'])
        assert w == widths, name
        assert d == depths, name
        assert all(x % gi == 0 for x, gi in zip(w, g)), name


def test_nostem_regnet_forward_shapes():
    model = NoStemRegNet(arch='regnetx_400mf')
    x = jnp.zeros((1, 32, 32, 64))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    outs = model.apply(variables, x, train=False)
    # out_indices (1, 2, 3): strides 2, 4, 8 relative to the input
    assert [o.shape for o in outs] == [
        (1, 16, 16, 64), (1, 8, 8, 160), (1, 4, 4, 384)]
    assert all(np.isfinite(np.asarray(o)).all() for o in outs)


def test_pointpillars_regnet_fpn_forward():
    """The regnet/free_anchor config wiring: pillars -> NoStemRegNet ->
    FPN-fused map -> anchor head."""
    import dataclasses

    from gga_tpu.models.detectors.voxelnet import (PointPillars,
                                                   PointPillarsConfig)

    cfg = dataclasses.replace(PointPillarsConfig.tiny(),
                              backbone='regnetx_400mf', neck='fpn')
    model = PointPillars(cfg)
    rng = np.random.RandomState(0)
    pts = np.concatenate([
        rng.uniform(0, 70, (1, 512, 1)), rng.uniform(-40, 40, (1, 512, 1)),
        rng.uniform(-3, 1, (1, 512, 1)), rng.rand(1, 512, 1)],
        -1).astype(np.float32)
    valid = np.ones((1, 512), bool)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(pts),
                           jnp.asarray(valid), train=False)
    out = model.apply(variables, jnp.asarray(pts), jnp.asarray(valid),
                      train=False)
    assert np.isfinite(np.asarray(out['cls'])).all()
    assert np.isfinite(np.asarray(out['reg'])).all()


def test_ssn_detector_forward():
    import dataclasses

    from gga_tpu.models.dense_heads.shape_aware_head import (
        ShapeAwareConfig, ShapeTask)
    from gga_tpu.models.detectors.ssn import SSNConfig, SSNDetector

    head = ShapeAwareConfig(
        num_classes=3,
        tasks=(ShapeTask(2, (16, 16), (1, 1)),
               ShapeTask(1, (16,), (2,))),
        bev_range=(0, -40.96, 71.68, 40.96), nms_pre=32, max_num=16)
    cfg = SSNConfig(
        voxel_size=(0.64, 0.64, 4.0),
        point_cloud_range=(0, -40.96, -3, 71.68, 40.96, 1),
        max_voxels=1024, pfn_channels=(16,), scatter_shape=(128, 112),
        backbone_channels=(16, 32, 32), backbone_layers=(1, 1, 1),
        neck_channels=(16, 16, 16), head=head)
    model = SSNDetector(cfg)
    rng = np.random.RandomState(1)
    pts = np.concatenate([
        rng.uniform(0, 70, (1, 256, 1)), rng.uniform(-40, 40, (1, 256, 1)),
        rng.uniform(-3, 1, (1, 256, 1)), rng.rand(1, 256, 1)],
        -1).astype(np.float32)
    valid = np.ones((1, 256), bool)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(pts),
                           jnp.asarray(valid), train=False)
    outs = model.apply(variables, jnp.asarray(pts), jnp.asarray(valid),
                       train=False)
    assert len(outs) == 2
    # group 0 at neck resolution, group 1 strided 2x
    assert outs[0]['cls'].shape[1] == outs[1]['cls'].shape[1] * 2
    for o in outs:
        assert np.isfinite(np.asarray(o['cls'])).all()
