"""Inference API variants (apis/inference.py equivalents): mono,
multi-modality, segmentor on tiny models."""
import jax
import numpy as np

from gga_tpu.apis import (inference_mono_3d_detector,
                          inference_multi_modality_detector,
                          inference_segmentor)


def test_inference_mono_smoke():
    from gga_tpu.models.detectors.smoke import (SMOKEDetector,
                                                SMOKEModelConfig)
    cfg = SMOKEModelConfig.tiny()
    model = SMOKEDetector(cfg)
    img = np.zeros((64, 96, 3), np.float32)
    variables = model.init(jax.random.PRNGKey(0), img[None], train=False)
    k = np.eye(4, dtype=np.float32)
    k[0, 0] = k[1, 1] = 60.0
    # SMOKE decode takes (cam2img, trans_mat) — adapt via a wrapper
    import types
    m = types.SimpleNamespace(
        apply=model.apply,
        decode=lambda preds, kk: model.decode(
            preds, kk, np.tile(np.diag([0.25, 0.25, 1.0]
                                       ).astype(np.float32), (1, 1, 1))))
    out = inference_mono_3d_detector(m, cfg, variables, img, k)
    assert out['boxes_3d'].shape[-1] == 7


def test_inference_multi_modality_mvxnet():
    from gga_tpu.models.detectors.mvxnet import MVXNet, MVXNetConfig
    cfg = MVXNetConfig.tiny()
    model = MVXNet(cfg)
    pts = np.random.rand(256, 4).astype(np.float32) * 20
    img = np.zeros((64, 96, 3), np.float32)
    l2i = np.eye(4, dtype=np.float32)
    variables = model.init(jax.random.PRNGKey(0), pts[None, :128],
                           np.ones((1, 128), bool), img[None],
                           l2i[None], train=False)
    out = inference_multi_modality_detector(
        model, cfg, variables, pts, img, l2i, max_points=128)
    assert out['boxes_3d'].shape[-1] == 7
    assert out['scores_3d'].ndim == 1


def test_inference_segmentor():
    from gga_tpu.models.segmentors.encoder_decoder import (
        EncoderDecoder3D, EncoderDecoder3DConfig)
    cfg = EncoderDecoder3DConfig(
        num_classes=5, in_channels=6, num_points=(64, 16, 8, 4),
        sa_channels=((8, 8),) * 4,
        fp_channels=((8,), (8,), (8,), (8,)), head_channels=8)
    model = EncoderDecoder3D(cfg)
    pts = np.random.rand(200, 6).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), pts[None, :128],
                           np.ones((1, 128), bool), train=False)
    labels = inference_segmentor(model, variables, pts, max_points=128)
    assert labels.shape == (128,)
    assert labels.max() < 5
