"""Round-trip tests for the indoor raw-data converters: fake raw layout
-> converter -> info pkl -> dataset -> (sunrgbd) one FCAF3D loss+grad.

Mirrors the reference converter behavior
(/root/reference/tools/data_converter/{sunrgbd,scannet,s3dis}_data_utils.py).
"""
import os
import pickle

import numpy as np
import pytest

from gga_tpu.data.indoor_converter import (create_s3dis_infos,
                                           create_scannet_infos,
                                           create_sunrgbd_infos)


# ---------------------------------------------------------------------------
# SUN RGB-D

@pytest.fixture(scope='module')
def sunrgbd_raw(tmp_path_factory):
    root = str(tmp_path_factory.mktemp('sunrgbd_raw'))
    tv = os.path.join(root, 'sunrgbd_trainval')
    for d in ('depth', 'label', 'calib', 'image'):
        os.makedirs(os.path.join(tv, d))
    from PIL import Image
    from scipy import io as sio
    rng = np.random.RandomState(0)
    # two objects; label line stores HALF sizes (dy dx dz) and the
    # orientation vector (cos, sin)
    objs = [
        ('bed', (1.0, 2.0, 0.4), (2.0, 1.5, 0.8), 0.3),
        ('table', (-1.0, 1.5, 0.3), (0.9, 0.9, 0.6), -0.2),
        ('unknown_cls', (0.0, 0.0, 0.0), (1.0, 1.0, 1.0), 0.0),
    ]
    for idx in (0, 5):
        pts = rng.uniform(-3, 3, (2000, 6)).astype(np.float64)
        sio.savemat(os.path.join(tv, 'depth', f'{idx:06d}.mat'),
                    {'instance': pts})
        with open(os.path.join(tv, 'label', f'{idx:06d}.txt'), 'w') as f:
            for name, c, s, yaw in objs:
                ox, oy = np.cos(yaw), np.sin(yaw)
                # xmin ymin dx dy cx cy cz w/2 l/2 h/2 ox oy
                f.write(f'{name} 10 20 30 40 {c[0]} {c[1]} {c[2]} '
                        f'{s[1]/2} {s[0]/2} {s[2]/2} {ox} {oy}\n')
        with open(os.path.join(tv, 'calib', f'{idx:06d}.txt'), 'w') as f:
            rt = np.eye(3).reshape(-1, order='F')
            k = np.diag([500., 500., 1.]).reshape(-1, order='F')
            f.write(' '.join(str(x) for x in rt) + '\n')
            f.write(' '.join(str(x) for x in k) + '\n')
        Image.new('RGB', (64, 48)).save(
            os.path.join(tv, 'image', f'{idx:06d}.jpg'))
    with open(os.path.join(tv, 'train_data_idx.txt'), 'w') as f:
        f.write('0\n5\n')
    with open(os.path.join(tv, 'val_data_idx.txt'), 'w') as f:
        f.write('5\n')
    return root


def test_sunrgbd_converter_infos(sunrgbd_raw):
    paths = create_sunrgbd_infos(sunrgbd_raw, workers=1)
    with open(paths['train'], 'rb') as f:
        infos = pickle.load(f)
    assert len(infos) == 2
    info = infos[0]
    assert info['point_cloud']['num_features'] == 6
    assert os.path.exists(os.path.join(sunrgbd_raw, info['pts_path']))
    np.testing.assert_array_equal(info['image']['image_shape'], [48, 64])
    assert info['calib']['K'].shape == (3, 3)
    a = info['annos']
    assert a['gt_num'] == 2  # unknown_cls filtered
    np.testing.assert_array_equal(a['name'], ['bed', 'table'])
    np.testing.assert_array_equal(a['class'], [0, 1])
    # box3d: centroid + full sizes (l, w, h) + heading
    np.testing.assert_allclose(
        a['gt_boxes_upright_depth'][0],
        [1.0, 2.0, 0.4, 2.0, 1.5, 0.8, 0.3], atol=1e-6)
    np.testing.assert_allclose(a['bbox'][0], [10, 20, 40, 60])
    with open(paths['val'], 'rb') as f:
        assert len(pickle.load(f)) == 1


def test_sunrgbd_roundtrip_train_step(sunrgbd_raw):
    """converter output -> SunRgbdDataset -> one FCAF3D loss+grad."""
    import jax
    import jax.numpy as jnp

    from gga_tpu.data.sunrgbd import SunRgbdDataset
    from gga_tpu.models.dense_heads import fcaf3d_head as fh
    from gga_tpu.models.detectors.fcaf3d import (FCAF3DDetector,
                                                 FCAF3DModelConfig)

    paths = create_sunrgbd_infos(sunrgbd_raw, workers=1)
    cfg = FCAF3DModelConfig.tiny()
    ds = SunRgbdDataset(sunrgbd_raw, paths['train'], num_points=512,
                        max_objs=cfg.head.max_objs)
    batch = next(ds.epoch_batches(2, shuffle=False))
    model = FCAF3DDetector(cfg)
    pts = jnp.asarray(batch['points'])
    colors = jnp.asarray(batch['colors'])
    pvalid = jnp.asarray(batch['points_valid'])
    variables = model.init(jax.random.PRNGKey(0), pts, colors, pvalid,
                           train=False)

    def loss_fn(params):
        outs, _ = model.apply(
            {'params': params, 'batch_stats': variables['batch_stats']},
            pts, colors, pvalid, train=True, mutable=['batch_stats'])
        total, _ = fh.loss(cfg.head, outs,
                           jnp.asarray(batch['gt_boxes']),
                           jnp.asarray(batch['gt_labels']),
                           jnp.asarray(batch['obj_valid']))
        return total

    loss, grads = jax.value_and_grad(loss_fn)(variables['params'])
    assert np.isfinite(float(loss))
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in flat)


# ---------------------------------------------------------------------------
# ScanNet

def test_scannet_converter(tmp_path):
    root = str(tmp_path)
    inst = os.path.join(root, 'scannet_instance_data')
    os.makedirs(inst)
    os.makedirs(os.path.join(root, 'meta_data'))
    rng = np.random.RandomState(1)
    scene = 'scene0000_00'
    n = 800
    pts = rng.uniform(-2, 2, (n, 6)).astype(np.float32)
    np.save(os.path.join(inst, f'{scene}_vert.npy'), pts)
    # two boxes: nyu40 ids 4 (bed -> class 1) and 7 (table -> class 4)
    aligned = np.array([[0, 0, 0, 1, 1, 1, 4],
                        [1, 1, 0.5, 0.5, 0.5, 0.5, 7]], np.float64)
    np.save(os.path.join(inst, f'{scene}_aligned_bbox.npy'), aligned)
    np.save(os.path.join(inst, f'{scene}_unaligned_bbox.npy'),
            aligned + 0.1)
    np.save(os.path.join(inst, f'{scene}_axis_align_matrix.npy'),
            np.eye(4))
    sem = rng.choice([0, 1, 4, 7, 39], n).astype(np.int64)
    ins = rng.randint(0, 3, n).astype(np.int64)
    np.save(os.path.join(inst, f'{scene}_sem_label.npy'), sem)
    np.save(os.path.join(inst, f'{scene}_ins_label.npy'), ins)
    with open(os.path.join(root, 'meta_data', 'scannetv2_train.txt'),
              'w') as f:
        f.write(scene + '\n')

    paths = create_scannet_infos(root, workers=1)
    with open(paths['train'], 'rb') as f:
        infos = pickle.load(f)
    info = infos[0]
    a = info['annos']
    assert a['gt_num'] == 2
    np.testing.assert_array_equal(a['name'], ['bed', 'table'])
    np.testing.assert_array_equal(a['class'], [1, 4])
    np.testing.assert_allclose(a['gt_boxes_upright_depth'],
                               aligned[:, :6])
    assert a['axis_align_matrix'].shape == (4, 4)
    # mask bins round-trip
    sem_back = np.fromfile(
        os.path.join(root, info['pts_semantic_mask_path']), np.int64)
    np.testing.assert_array_equal(sem_back, sem)
    # seg_info artifacts (PointNet++ label weights)
    w = np.load(os.path.join(root, 'seg_info',
                             'train_label_weight.npy'))
    assert w.shape == (20,) and np.isfinite(w).all()
    idxs = np.load(os.path.join(root, 'seg_info',
                                'train_resampled_scene_idxs.npy'))
    assert (idxs == 0).all()

    # dataset consumes the converter output directly
    from gga_tpu.data.scannet import ScanNetDataset
    ds = ScanNetDataset(root, paths['train'], num_points=256, max_objs=8)
    item = ds[0]
    assert item['points'].shape == (256, 3)
    assert item['obj_valid'].sum() == 2


# ---------------------------------------------------------------------------
# S3DIS

def test_s3dis_converter(tmp_path):
    root = str(tmp_path)
    data = os.path.join(root, 's3dis_data')
    os.makedirs(data)
    rng = np.random.RandomState(2)
    stem = 'Area_1_office_1'
    n = 600
    pts = rng.uniform(0, 4, (n, 6)).astype(np.float32)
    sem = np.full(n, 2, np.int64)   # wall
    ins = np.zeros(n, np.int64)
    # one chair instance (sem id 8 -> det class 1) with a known extent
    sel = np.arange(50)
    pts[sel, :3] = rng.uniform(0, 1, (50, 3)) * [0.5, 0.6, 0.9] + \
        [2.0, 2.0, 0.0]
    pts[sel[0], :3] = [2.0, 2.0, 0.0]
    pts[sel[1], :3] = [2.5, 2.6, 0.9]
    sem[sel] = 8
    ins[sel] = 1
    np.save(os.path.join(data, f'{stem}_point.npy'), pts)
    np.save(os.path.join(data, f'{stem}_sem_label.npy'), sem)
    np.save(os.path.join(data, f'{stem}_ins_label.npy'), ins)

    paths = create_s3dis_infos(root, areas=(1,), workers=1)
    with open(paths['Area_1'], 'rb') as f:
        infos = pickle.load(f)
    a = infos[0]['annos']
    assert a['gt_num'] == 1
    np.testing.assert_array_equal(a['class'], [1])
    box = a['gt_boxes_upright_depth'][0]
    np.testing.assert_allclose(box[:3], [2.25, 2.3, 0.45], atol=1e-5)
    np.testing.assert_allclose(box[3:6], [0.5, 0.6, 0.9], atol=1e-5)

    from gga_tpu.data.seg_datasets import S3DISSegDataset
    ds = S3DISSegDataset(root, paths['Area_1'], num_points=256)
    item = ds[0]
    assert item['points'].shape[0] == 256
    assert set(np.unique(item['seg_labels'])) <= {2, 8}
    ins_back = ds.load_instance_mask(0)
    np.testing.assert_array_equal(ins_back, ins)
