"""End-to-end integration: data prep -> train steps -> inference ->
pseudo-label matching, on the synthetic mini-KITTI with the tiny model."""
import os
import pickle

import jax
import numpy as np
import pytest

from gga_tpu.data.dataset import KittiGGADataset
from gga_tpu.data.kitti import io as kio
from gga_tpu.data.kitti.gga_labels import calculate_gga_labels
from gga_tpu.data.kitti.gt_database import (create_gga_gt_database,
                                            create_reduced_point_clouds)
from gga_tpu.data.kitti.pseudo_labels import pseudo_label_matching
from gga_tpu.eval.submission import detections_to_kitti_annos
from gga_tpu.models.detectors.centerpoint_gga import (GGAModelConfig,
                                                      GGADetector,
                                                      decode_detections)
from gga_tpu.parallel.mesh import data_parallel_mesh, shard_batch
from gga_tpu.train.checkpoints import (load_from, resume_from,
                                       save_checkpoint)
from gga_tpu.train.loop import create_train_state, make_jitted_train_step
from gga_tpu.train.optim import build_optimizer

from ..test_data.fixtures import make_scene, write_kitti_scene


@pytest.fixture(scope='module')
def setup(tmp_path_factory):
    root = str(tmp_path_factory.mktemp('kitti_e2e'))
    rng = np.random.RandomState(0)
    boxes = np.array([
        [12.0, 2.0, -1.7, 3.9, 1.6, 1.55, 0.3],
        [20.0, -4.0, -1.7, 0.8, 0.6, 1.75, -0.2],
    ])
    names = ['Car', 'Pedestrian']
    infos = []
    for idx in range(2):
        pts = make_scene(rng, boxes, names, n_ground=2000, n_clutter=200,
                         pts_per_box=200)
        write_kitti_scene(root, idx, pts, boxes, names)
        info = kio.create_scene_info(root, 'train', idx)
        kio.compute_num_points_in_gt(root, info)
        calculate_gga_labels(
            kio.load_velodyne(f'{root}/training/velodyne/{idx:06d}.bin'),
            info, rng=np.random.RandomState(idx))
        infos.append(info)
    create_reduced_point_clouds(root, infos)
    create_gga_gt_database(root, infos)
    info_path = os.path.join(root, 'kitti_infos_train_GGA.pkl')
    with open(info_path, 'wb') as f:
        pickle.dump(infos, f)

    cfg = GGAModelConfig.tiny()
    model = GGADetector(cfg)
    ds = KittiGGADataset(root, info_path, max_points=4096,
                         max_objs=cfg.head.max_objs, max_cluster_pts=64)
    return root, infos, cfg, model, ds


def test_train_steps_and_inference(setup, tmp_path):
    root, infos, cfg, model, ds = setup
    batch = next(ds.epoch_batches(2, shuffle=False))
    batch.pop('gt_boxes')
    mesh = data_parallel_mesh(jax.devices()[:2])

    variables = model.init(jax.random.PRNGKey(0),
                           batch['points'][:1], batch['points_valid'][:1],
                           train=False)
    tx = build_optimizer(total_steps=50)
    state = create_train_state(model, variables, tx)

    with mesh:
        step = make_jitted_train_step(mesh, cfg.head)
        state = jax.device_put(state, jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec()))
        sb = shard_batch(mesh, batch)
        losses = []
        for i in range(3):
            state, logs = step(state, sb, jax.random.PRNGKey(2))
            losses.append(float(logs['loss']))
    assert all(np.isfinite(l) for l in losses)
    assert int(state.step) == 3
    assert losses[2] != losses[0]  # params actually moving

    # checkpoint roundtrip: save -> resume (full) -> load (weights only)
    ckpt_dir = str(tmp_path / 'ckpt')
    host_state = jax.device_get(state)
    save_checkpoint(ckpt_dir, host_state)
    fresh = create_train_state(model, variables, tx)
    resumed, ok = resume_from(ckpt_dir, fresh)
    assert ok and int(resumed.step) == 3
    loaded, ok = load_from(ckpt_dir, fresh)
    assert ok and int(loaded.step) == 0  # weights-only keeps fresh step
    p0 = jax.tree_util.tree_leaves(host_state.params)[0]
    p1 = jax.tree_util.tree_leaves(loaded.params)[0]
    np.testing.assert_allclose(np.asarray(p0), np.asarray(p1))

    # inference -> kitti annos -> pseudo matching (untrained weights: the
    # plumbing must survive arbitrary predictions)
    preds = model.apply({'params': host_state.params,
                         'batch_stats': host_state.batch_stats},
                        batch['points'], batch['points_valid'],
                        train=False)
    dets_batch = decode_detections(cfg, preds)
    detections = []
    for j in range(2):
        v = np.asarray(dets_batch['valid'][j])
        detections.append(dict(
            boxes_3d=np.asarray(dets_batch['boxes'][j])[v],
            scores_3d=np.asarray(dets_batch['scores'][j])[v],
            labels_3d=np.asarray(dets_batch['labels'][j])[v]))
    det_annos = detections_to_kitti_annos(
        detections, infos, class_names=('Pedestrian', 'Cyclist', 'Car'))
    pseudo_infos, _ = pseudo_label_matching(infos, det_annos)
    assert len(pseudo_infos) == 2
    for info in pseudo_infos:
        assert 'annos' in info
        a = info['annos']
        if len(a['name']):
            assert (a['dimensions'][:, 0]
                    >= a['dimensions'][:, 2] - 1e-6).all()
