"""Semantic correctness of the GGA losses: a head prediction that exactly
reproduces the GT box must zero the boundary-projection loss and (with
cluster points on the box edges) the point-to-box-alignment distances."""
import jax
import jax.numpy as jnp
import numpy as np

from gga_tpu.core import np_geometry as ng
from gga_tpu.models.dense_heads import centerpoint_head_gga as gga

CFG = gga.GGAHeadConfig(
    voxel_size=(0.05, 0.05, 0.1),
    point_cloud_range=(0., -40., -3., 70.4, 40., 1.),
    grid_size=(1408, 1600, 40), max_objs=8)

L2I = np.eye(4, dtype=np.float32)
L2I[0, 0], L2I[1, 1] = 721.5, 721.5
L2I[0, 2], L2I[1, 2] = 609.6, 172.9
# lidar x (forward) maps to camera z: swap axes like KITTI
PERM = np.array([[0, -1, 0, 0], [0, 0, -1, 0], [1, 0, 0, 0],
                 [0, 0, 0, 1]], np.float32)
L2I = L2I @ PERM


def _project_box2d(box):
    corners = ng.center_to_corner_box3d(
        box[None, :3], box[None, 3:6], box[None, 6:7][:, 0])[0]
    pix = ng.project_to_image(corners, L2I)
    return np.concatenate([pix.min(0), pix.max(0)])


def test_exact_prediction_zeroes_bpl_and_pal():
    box = np.array([20.0, 2.0, -1.5, 3.9, 1.6, 1.56, 0.3], np.float32)
    gravity_z = box[2] + box[5] / 2
    box2d = _project_box2d(box).astype(np.float32)

    B, M = 1, CFG.max_objs
    labels = np.full((B, M), -1, np.int32)
    labels[0, 0] = 2  # Car task
    valid = np.zeros((B, M), bool)
    valid[0, 0] = True
    pseudo = np.zeros((B, M, 7), np.float32)
    pseudo[0, 0] = box
    boxes_img = np.zeros((B, M, 4), np.float32)
    boxes_img[0, 0] = box2d
    bdry = np.zeros((B, M, 4), bool)
    l2i = np.broadcast_to(L2I, (B, M, 4, 4)).copy()

    targets = gga.build_targets(CFG, jax.random.PRNGKey(0),
                                jnp.asarray(labels), jnp.asarray(valid),
                                jnp.asarray(pseudo),
                                jnp.asarray(boxes_img), jnp.asarray(bdry),
                                jnp.asarray(l2i))
    t2 = targets[2]  # car task
    assert int(t2['mask'].sum()) == 1

    # construct pred maps that decode exactly to the GT box
    W, H = CFG.feature_map_size
    ind = int(np.asarray(t2['ind'])[0, 0])
    iy, ix = ind // W, ind % W
    fx = (box[0] - CFG.point_cloud_range[0]) / CFG.voxel_size[0] / 8 - ix
    fy = (box[1] - CFG.point_cloud_range[1]) / CFG.voxel_size[1] / 8 - iy

    def mk(ch, vals, base=0.0):
        m = np.full((B, H, W, ch), base, np.float32)
        m[0, iy, ix] = vals
        return jnp.asarray(m)

    preds_car = dict(
        heatmap=mk(1, [10.0], base=-10.0),  # confident bg everywhere else
        reg=mk(2, [fx, fy]),
        height=mk(1, [gravity_z]),
        dim=mk(3, np.log(box[3:6])),
        rot=mk(2, [np.sin(box[6]), np.cos(box[6])]),
    )
    zero_task = {k: (jnp.full_like(v, -10.0) if k == 'heatmap'
                     else jnp.zeros_like(v))
                 for k, v in preds_car.items()}
    preds = [zero_task, zero_task, preds_car]

    # cluster points ON the box edges (BEV): PAL min-edge distance = 0
    c, s = np.cos(box[6]), np.sin(box[6])
    edge_local = np.array([[box[3] / 2, 0.0], [-box[3] / 2, 0.2],
                           [0.3, box[4] / 2], [-0.2, -box[4] / 2]])
    edge_pts = np.stack([
        edge_local[:, 0] * c - edge_local[:, 1] * s + box[0],
        edge_local[:, 0] * s + edge_local[:, 1] * c + box[1]], -1)
    ibp = np.zeros((B, M, 8, 2), np.float32)
    ibp[0, 0, :4] = edge_pts
    ibp_valid = np.zeros((B, M, 8), bool)
    ibp_valid[0, 0, :4] = True

    total, logs = gga.loss(CFG, preds, targets, jnp.asarray(ibp),
                           jnp.asarray(ibp_valid))
    # exact projection -> BPL ~ 0 (subcell rounding of the heatmap center
    # keeps it tiny but nonzero)
    assert float(logs['task2.loss_bbox']) < 1e-3, float(
        logs['task2.loss_bbox'])
    # points on edges -> min-distance PAL ~ 0
    assert float(logs['task2.distancemin']) < 1e-4
    # interior-band distances also zero (points within 2x half extents)
    assert float(logs['task2.distancex']) < 1e-4
    assert float(logs['task2.distancey']) < 1e-4
    # heatmap peak matched: the floor is set by clip_sigmoid's 1e-4 clamp
    # summed over ~35k background pixels (x5 task weight) ~ 17.6
    assert float(logs['task2.loss_heatmap']) < 25.0
    # a WRONG prediction must increase BPL
    preds_bad = dict(preds_car)
    preds_bad['dim'] = mk(3, np.log(box[3:6] * 2.0))
    preds2 = [zero_task, zero_task, preds_bad]
    _, logs2 = gga.loss(CFG, preds2, targets, jnp.asarray(ibp),
                        jnp.asarray(ibp_valid))
    assert float(logs2['task2.loss_bbox']) > 10 * max(
        float(logs['task2.loss_bbox']), 1e-6)


def test_dim_prior_anchor_loss():
    """Optional dim-prior anchor (TPU-delta, off by default): zero when the
    predicted log-dims equal the class prior, positive when they shrink."""
    box = np.array([20.0, 2.0, -1.5, 3.9, 1.6, 1.56, 0.3], np.float32)
    box2d = _project_box2d(box).astype(np.float32)
    cfg = gga.GGAHeadConfig(
        voxel_size=CFG.voxel_size, point_cloud_range=CFG.point_cloud_range,
        grid_size=CFG.grid_size, max_objs=8,
        task_dim_priors=((0.8, 0.6, 1.7), (1.7, 0.6, 1.7),
                         (3.9, 1.6, 1.56)),
        loss_dim_prior_weight=0.2)

    B, M = 1, cfg.max_objs
    labels = np.full((B, M), -1, np.int32)
    labels[0, 0] = 2
    valid = np.zeros((B, M), bool)
    valid[0, 0] = True
    pseudo = np.zeros((B, M, 7), np.float32)
    pseudo[0, 0] = box
    boxes_img = np.zeros((B, M, 4), np.float32)
    boxes_img[0, 0] = box2d
    bdry = np.zeros((B, M, 4), bool)
    l2i = np.broadcast_to(L2I, (B, M, 4, 4)).copy()
    targets = gga.build_targets(cfg, jax.random.PRNGKey(0),
                                jnp.asarray(labels), jnp.asarray(valid),
                                jnp.asarray(pseudo),
                                jnp.asarray(boxes_img), jnp.asarray(bdry),
                                jnp.asarray(l2i))
    W, H = cfg.feature_map_size
    ind = int(np.asarray(targets[2]['ind'])[0, 0])
    iy, ix = ind // W, ind % W

    def mk(ch, vals, base=0.0):
        m = np.full((B, H, W, ch), base, np.float32)
        m[0, iy, ix] = vals
        return jnp.asarray(m)

    def preds_with_dims(dims):
        car = dict(heatmap=mk(1, [10.0], base=-10.0),
                   reg=mk(2, [0.0, 0.0]), height=mk(1, [box[2]]),
                   dim=mk(3, np.log(dims)), rot=mk(2, [0.0, 1.0]))
        zero = {k: (jnp.full_like(v, -10.0) if k == 'heatmap'
                    else jnp.zeros_like(v)) for k, v in car.items()}
        return [zero, zero, car]

    ibp = jnp.zeros((B, M, 8, 2), jnp.float32)
    ibp_valid = jnp.zeros((B, M, 8), bool)

    _, logs_exact = gga.loss(cfg, preds_with_dims(box[3:6]), targets,
                             ibp, ibp_valid)
    assert float(logs_exact['task2.loss_dim_prior']) < 1e-6
    # shrunken width -> positive anchor loss, and it enters the total
    _, logs_shrunk = gga.loss(cfg, preds_with_dims([3.9, 0.9, 1.56]),
                              targets, ibp, ibp_valid)
    assert float(logs_shrunk['task2.loss_dim_prior']) > 1e-3
    assert (float(logs_shrunk['loss']) - float(logs_exact['loss'])
            >= float(logs_shrunk['task2.loss_dim_prior']) * 0.5)
    # weight 0 (parity default) -> key absent
    _, logs_off = gga.loss(CFG, preds_with_dims(box[3:6]), targets[:3],
                           ibp, ibp_valid)
    assert 'task2.loss_dim_prior' not in logs_off


def test_yaw_prior_anchor_loss():
    """Optional init-pseudo yaw anchor: zero when predicted sin/cos match
    the pseudo yaw, positive when rotated, absent at weight 0."""
    box = np.array([20.0, 2.0, -1.5, 3.9, 1.6, 1.56, 0.3], np.float32)
    box2d = _project_box2d(box).astype(np.float32)
    cfg = gga.GGAHeadConfig(
        voxel_size=CFG.voxel_size, point_cloud_range=CFG.point_cloud_range,
        grid_size=CFG.grid_size, max_objs=8, loss_yaw_prior_weight=0.5)

    B, M = 1, cfg.max_objs
    labels = np.full((B, M), -1, np.int32)
    labels[0, 0] = 2
    valid = np.zeros((B, M), bool)
    valid[0, 0] = True
    pseudo = np.zeros((B, M, 7), np.float32)
    pseudo[0, 0] = box
    boxes_img = np.zeros((B, M, 4), np.float32)
    boxes_img[0, 0] = box2d
    bdry = np.zeros((B, M, 4), bool)
    l2i = np.broadcast_to(L2I, (B, M, 4, 4)).copy()
    targets = gga.build_targets(cfg, jax.random.PRNGKey(0),
                                jnp.asarray(labels), jnp.asarray(valid),
                                jnp.asarray(pseudo),
                                jnp.asarray(boxes_img), jnp.asarray(bdry),
                                jnp.asarray(l2i))
    W, H = cfg.feature_map_size
    ind = int(np.asarray(targets[2]['ind'])[0, 0])
    iy, ix = ind // W, ind % W

    def mk(ch, vals, base=0.0):
        m = np.full((B, H, W, ch), base, np.float32)
        m[0, iy, ix] = vals
        return jnp.asarray(m)

    def preds_with_yaw(yaw):
        car = dict(heatmap=mk(1, [10.0], base=-10.0),
                   reg=mk(2, [0.0, 0.0]), height=mk(1, [box[2]]),
                   dim=mk(3, np.log(box[3:6])),
                   rot=mk(2, [np.sin(yaw), np.cos(yaw)]))
        zero = {k: (jnp.full_like(v, -10.0) if k == 'heatmap'
                    else jnp.zeros_like(v)) for k, v in car.items()}
        return [zero, zero, car]

    ibp = jnp.zeros((B, M, 8, 2), jnp.float32)
    ibp_valid = jnp.zeros((B, M, 8), bool)

    _, logs_exact = gga.loss(cfg, preds_with_yaw(box[6]), targets,
                             ibp, ibp_valid)
    assert float(logs_exact['task2.loss_yaw_prior']) < 1e-6
    _, logs_rot = gga.loss(cfg, preds_with_yaw(box[6] + 0.5), targets,
                           ibp, ibp_valid)
    assert float(logs_rot['task2.loss_yaw_prior']) > 1e-3
    assert (float(logs_rot['loss']) - float(logs_exact['loss'])
            >= float(logs_rot['task2.loss_yaw_prior']) * 0.5)
    _, logs_off = gga.loss(CFG, preds_with_yaw(box[6] + 0.5), targets[:3],
                           ibp, ibp_valid)
    assert 'task2.loss_yaw_prior' not in logs_off


def test_build_targets_hm_dyn_matches_static(monkeypatch):
    """build_targets under GGA_HM_DYN (dynamic-chunk heatmap render)
    must produce bit-identical targets to the static-scan render."""
    from gga_tpu.core import gaussian as G

    rng = np.random.RandomState(2)
    B, M = 2, CFG.max_objs
    labels = np.full((B, M), -1, np.int32)
    labels[:, :5] = rng.randint(0, 3, (B, 5))
    valid = np.zeros((B, M), bool)
    valid[:, :5] = True
    pseudo = np.zeros((B, M, 7), np.float32)
    pseudo[:, :5, 0] = rng.uniform(5, 60, (B, 5))
    pseudo[:, :5, 1] = rng.uniform(-30, 30, (B, 5))
    pseudo[:, :5, 2] = -1.0
    pseudo[:, :5, 3:6] = rng.uniform(0.5, 4.0, (B, 5, 3))
    boxes_img = np.zeros((B, M, 4), np.float32)
    bdry = np.zeros((B, M, 4), bool)
    l2i = np.broadcast_to(L2I, (B, M, 4, 4)).copy()
    args = (jnp.asarray(labels), jnp.asarray(valid), jnp.asarray(pseudo),
            jnp.asarray(boxes_img), jnp.asarray(bdry), jnp.asarray(l2i))

    monkeypatch.setattr(G, 'HM_DYN', False)
    t0 = gga.build_targets(CFG, jax.random.PRNGKey(0), *args)
    monkeypatch.setattr(G, 'HM_DYN', True)
    t1 = gga.build_targets(CFG, jax.random.PRNGKey(0), *args)
    for a, b in zip(t0, t1):
        np.testing.assert_array_equal(np.asarray(a['heatmap']),
                                      np.asarray(b['heatmap']))
        np.testing.assert_array_equal(np.asarray(a['ind']),
                                      np.asarray(b['ind']))
