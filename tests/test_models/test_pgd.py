"""PGD monocular detector: forward/targets/loss/decode smoke (tiny)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gga_tpu.models.dense_heads import pgd_head as ph
from gga_tpu.models.detectors.pgd import PGDModelConfig, PGDDetector

H, W = 96, 320  # divisible by 32


@pytest.fixture(scope='module')
def pgd_setup():
    cfg = PGDModelConfig.tiny()
    model = PGDDetector(cfg)
    rng = np.random.RandomState(0)
    imgs = rng.randn(2, H, W, 3).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(imgs),
                           train=False)
    return cfg, model, variables, jnp.asarray(imgs)


def _featmap_sizes(cfg):
    return [(H // s, W // s) for s in cfg.head.strides]


def _fake_targets(cfg, B=2, M=8):
    rng = np.random.RandomState(1)
    gt_bboxes = np.zeros((B, M, 4), np.float32)
    gt_bboxes[:, :3] = [[40, 30, 120, 80], [150, 20, 260, 90],
                        [10, 50, 60, 90]]
    labels = np.zeros((B, M), np.int32)
    labels[:, :3] = [0, 2, 1]
    cam3d = np.zeros((B, M, 7), np.float32)
    cam3d[:, :3, :3] = [[1.0, 0.5, 15.0], [-2.0, 0.6, 30.0],
                        [3.0, 0.4, 8.0]]
    cam3d[:, :3, 3:6] = [[0.8, 1.7, 0.6], [3.9, 1.56, 1.6],
                         [1.76, 1.7, 0.6]]
    cam3d[:, :3, 6] = 0.4
    centers2d = np.zeros((B, M, 2), np.float32)
    centers2d[:, :3] = [[80, 55], [205, 55], [35, 70]]
    depths = np.zeros((B, M), np.float32)
    depths[:, :3] = [15.0, 30.0, 8.0]
    valid = np.zeros((B, M), bool)
    valid[:, :3] = True
    cam2img = np.broadcast_to(np.eye(4, dtype=np.float32),
                              (B, 4, 4)).copy()
    cam2img[:, 0, 0] = 200.0
    cam2img[:, 1, 1] = 200.0
    cam2img[:, 0, 2] = W / 2
    cam2img[:, 1, 2] = H / 2
    return (jnp.asarray(gt_bboxes), jnp.asarray(labels),
            jnp.asarray(cam3d), jnp.asarray(centers2d),
            jnp.asarray(depths), jnp.asarray(valid), jnp.asarray(cam2img))


def test_forward_shapes(pgd_setup):
    cfg, model, variables, imgs = pgd_setup
    preds, fuse = model.apply(variables, imgs, train=False)
    assert len(preds) == 4
    for lvl, (p, s) in enumerate(zip(preds, cfg.head.strides)):
        assert p['cls_score'].shape == (2, H // s, W // s, 3)
        assert p['bbox_pred'].shape == (2, H // s, W // s, 27)
        assert p['dir_pred'].shape[-1] == 2
        assert p['depth_cls'].shape[-1] == cfg.head.depth_bins
        assert p['centerness'].shape[-1] == 1
        # decoded sizes are positive (exp * priors)
        assert float(p['bbox_pred'][..., 3:6].min()) > 0


def test_targets_assignment(pgd_setup):
    cfg, model, variables, imgs = pgd_setup
    (gt_bboxes, labels, cam3d, centers2d, depths, valid,
     cam2img) = _fake_targets(cfg)
    fsz = _featmap_sizes(cfg)
    pts = ph.level_points(cfg.head, fsz)
    points = jnp.concatenate(pts)
    strides_flat = jnp.concatenate([
        jnp.full((p.shape[0],), s, jnp.float32)
        for p, s in zip(pts, cfg.head.strides)])
    regress_flat = jnp.concatenate([
        jnp.broadcast_to(jnp.asarray(r, jnp.float32), (p.shape[0], 2))
        for p, r in zip(pts, cfg.head.regress_ranges)])

    t = ph.build_targets(cfg.head, points, strides_flat, regress_flat,
                         gt_bboxes[0], labels[0], cam3d[0], centers2d[0],
                         depths[0], valid[0])
    n_pos = int(t['pos_mask'].sum())
    assert n_pos > 0
    # positive points carry the right depth target
    pm = np.asarray(t['pos_mask'])
    bt = np.asarray(t['bbox_targets_3d'])
    assert set(np.round(bt[pm][:, 2], 2)).issubset({8.0, 15.0, 30.0})
    # centerness in (0, 1]
    ct = np.asarray(t['centerness'])[pm]
    assert (ct > 0).all() and (ct <= 1).all()
    # background elsewhere
    lab = np.asarray(t['labels_3d'])
    assert (lab[~pm] == cfg.head.num_classes).all()


def test_loss_and_grads(pgd_setup):
    cfg, model, variables, imgs = pgd_setup
    batch = _fake_targets(cfg)
    (gt_bboxes, labels, cam3d, centers2d, depths, valid, cam2img) = batch
    fsz = _featmap_sizes(cfg)
    pts = ph.level_points(cfg.head, fsz)
    points = jnp.concatenate(pts)
    strides_flat = jnp.concatenate([
        jnp.full((p.shape[0],), s, jnp.float32)
        for p, s in zip(pts, cfg.head.strides)])
    regress_flat = jnp.concatenate([
        jnp.broadcast_to(jnp.asarray(r, jnp.float32), (p.shape[0], 2))
        for p, r in zip(pts, cfg.head.regress_ranges)])

    targets = jax.vmap(
        lambda b, l, c3, c2, d, v: ph.build_targets(
            cfg.head, points, strides_flat, regress_flat, b, l, c3, c2,
            d, v))(gt_bboxes, labels, cam3d, centers2d, depths, valid)

    def loss_fn(params):
        preds, fuse = model.apply(
            {'params': params, 'batch_stats': variables['batch_stats']},
            imgs, train=True, mutable=['batch_stats'])[0]
        total, logs = ph.loss(cfg.head, preds, fuse, targets, cam2img,
                              fsz)
        return total, logs

    (total, logs), grads = jax.value_and_grad(
        loss_fn, has_aux=True)(variables['params'])
    assert np.isfinite(float(total))
    for k in ('loss_cls', 'loss_offset', 'loss_size', 'loss_rotsin',
              'loss_dir', 'loss_depth', 'loss_kpts', 'loss_bbox2d',
              'loss_consistency', 'loss_centerness'):
        assert k in logs and np.isfinite(float(logs[k])), k
    assert int(logs['num_pos']) > 0
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in flat)
    gn = float(sum((np.asarray(g) ** 2).sum() for g in flat) ** 0.5)
    assert gn > 0


def test_decode(pgd_setup):
    cfg, model, variables, imgs = pgd_setup
    (gt_bboxes, labels, cam3d, centers2d, depths, valid,
     cam2img) = _fake_targets(cfg)
    preds, fuse = model.apply(variables, imgs, train=False)
    out = ph.decode(cfg.head, preds, fuse, cam2img, _featmap_sizes(cfg))
    K = 3 * cfg.head.max_per_img
    assert out['boxes'].shape == (2, K, 7)
    assert out['bboxes2d'].shape == (2, K, 4)
    assert np.isfinite(np.asarray(out['boxes'])).all()
    lab = np.asarray(out['labels'])
    assert lab.min() >= 0 and lab.max() <= 2
