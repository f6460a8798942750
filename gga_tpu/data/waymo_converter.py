"""Waymo -> KITTI-format converter + info-pkl gatherer.

Rebuild of the reference pipeline
(/root/reference/tools/data_converter/waymo_converter.py:24 Waymo2KITTI
and kitti_data_utils.py:330 WaymoInfoGatherer): stage 1 turns raw
TFRecord frames into a KITTI-format tree (7-digit prefix ids: 0=train,
1=val, 2=test; 6-dim velodyne xyz/intensity/elongation/mask-index;
5-camera calib; label_all + per-camera labels; pose; timestamp), stage 2
gathers the mmdet3d waymo info pkls `WaymoDataset`
(gga_tpu/data/kitti_det.py:147) consumes.

The frame->KITTI math (camera-frame label projection, calib assembly) is
pure numpy and testable without the SDK; only the TFRecord parsing needs
the external `waymo_open_dataset` devkit (+tensorflow), gated at call
time like the nuScenes converter.
"""
from __future__ import annotations

import os
import pickle
from concurrent.futures import ThreadPoolExecutor

import numpy as np

from .kitti.io import add_difficulty, parse_label

# waymo FRONT camera frame (x forward) -> kitti reference camera frame
# (z forward, y down)
T_FRONT_CAM_TO_REF = np.array([[0.0, -1.0, 0.0, 0.0],
                               [0.0, 0.0, -1.0, 0.0],
                               [1.0, 0.0, 0.0, 0.0],
                               [0.0, 0.0, 0.0, 1.0]])

WAYMO_CLASSES = ('UNKNOWN', 'VEHICLE', 'PEDESTRIAN', 'SIGN', 'CYCLIST')
WAYMO_TO_KITTI = {'UNKNOWN': 'DontCare', 'VEHICLE': 'Car',
                  'PEDESTRIAN': 'Pedestrian', 'CYCLIST': 'Cyclist',
                  'SIGN': 'Sign'}
SELECTED_CLASSES = ('VEHICLE', 'PEDESTRIAN', 'CYCLIST')


def build_calib(camera_calibs):
    """5 waymo camera calibrations -> (kitti calib text, velo->front-cam).

    ``camera_calibs``: list ordered by camera id of dicts with
    ``extrinsic`` (4x4 cam->vehicle) and ``intrinsic``
    ([fx, fy, cx, cy, ...]). The waymo "velodyne" frame IS the vehicle
    frame, so Tr_velo_to_cam_i = T_front_ref @ inv(extrinsic_i)
    (waymo_converter.py:149).
    """
    lines = []
    trs = []
    for cam in camera_calibs:
        p = np.zeros((3, 4))
        p[0, 0], p[1, 1] = cam['intrinsic'][0], cam['intrinsic'][1]
        p[0, 2], p[1, 2] = cam['intrinsic'][2], cam['intrinsic'][3]
        p[2, 2] = 1.0
        lines.append(p.reshape(-1))
        trs.append((T_FRONT_CAM_TO_REF
                    @ np.linalg.inv(np.asarray(cam['extrinsic'])))[:3]
                   .reshape(-1))
    text = ''
    for i, p in enumerate(lines):
        text += f'P{i}: ' + ' '.join(f'{v:e}' for v in p) + '\n'
    text += 'R0_rect: ' + ' '.join(
        f'{v:e}' for v in np.eye(3).reshape(-1)) + '\n'
    for i, t in enumerate(trs):
        text += f'Tr_velo_to_cam_{i}: ' + ' '.join(
            f'{v:e}' for v in t) + '\n'
    t_front = np.eye(4)
    t_front[:3] = trs[0].reshape(3, 4)
    return text, t_front


def laser_label_line(obj, bbox2d, t_velo_to_front_cam):
    """One laser label -> KITTI label line (waymo_converter.py:259).

    ``obj``: dict with ``type`` (waymo class name), ``box``
    ([cx, cy, cz, l, w, h, heading], vehicle frame, volumetric center).
    Box center drops to the bottom face, projects into the kitti
    reference camera; ry = -heading - pi/2 (axis swap).
    """
    cx, cy, cz, length, width, height, heading = obj['box']
    bottom = np.array([cx, cy, cz - height / 2, 1.0])
    x, y, z, _ = (t_velo_to_front_cam @ bottom).tolist()
    ry = -heading - np.pi / 2
    name = WAYMO_TO_KITTI[obj['type']]
    b = bbox2d if bbox2d is not None else (0, 0, 0, 0)
    return (f'{name} 0 0 -10 '
            f'{round(b[0], 2)} {round(b[1], 2)} '
            f'{round(b[2], 2)} {round(b[3], 2)} '
            f'{round(height, 2)} {round(width, 2)} {round(length, 2)} '
            f'{round(x, 2)} {round(y, 2)} {round(z, 2)} {round(ry, 2)}')


def convert_frame(frame, save_root, sample, *, test_mode=False):
    """Write one frame dict as KITTI-format files.

    ``frame``: plain-numpy dict (``_frame_to_dict`` builds it from the
    proto) with keys ``points`` [N, 6], ``camera_calibs`` (build_calib
    input), ``images`` {cam_id: jpeg bytes}, ``pose`` 4x4, ``timestamp``
    int, ``labels`` (list of laser_label_line objs + ``num_points`` +
    ``camera_id``/``bbox2d``). ``sample`` is the 7-digit prefix id str.
    """
    sub = 'testing' if test_mode else 'training'
    root = os.path.join(save_root, sub)

    def path(kind, ext):
        os.makedirs(os.path.join(root, kind), exist_ok=True)
        return os.path.join(root, kind, f'{sample}{ext}')

    np.asarray(frame['points'], np.float32).tofile(path('velodyne',
                                                        '.bin'))
    calib_text, t_front = build_calib(frame['camera_calibs'])
    with open(path('calib', '.txt'), 'w') as f:
        f.write(calib_text)
    for cam_id, data in frame.get('images', {}).items():
        with open(path(f'image_{cam_id}', '.jpg'), 'wb') as f:
            f.write(data)
    np.savetxt(path('pose', '.txt'), np.asarray(frame['pose']))
    with open(path('timestamp', '.txt'), 'w') as f:
        f.write(str(frame['timestamp']))

    if test_mode:
        return
    per_cam = {i: [] for i in range(5)}
    all_lines = []
    for obj in frame.get('labels', []):
        if obj['type'] not in SELECTED_CLASSES:
            continue
        if obj.get('num_points', 1) < 1:  # filter_empty_3dboxes
            continue
        cam = obj.get('camera_id')
        line = laser_label_line(obj, obj.get('bbox2d'), t_front)
        all_lines.append(f'{line} {0 if cam is None else cam}')
        per_cam.setdefault(0 if cam is None else cam, []).append(line)
    with open(path('label_all', '.txt'), 'w') as f:
        f.write('\n'.join(all_lines) + ('\n' if all_lines else ''))
    for cam, lines in per_cam.items():
        if lines:
            with open(path(f'label_{cam}', '.txt'), 'w') as f:
                f.write('\n'.join(lines) + '\n')


def convert_tfrecords(load_dir, save_root, prefix, *, test_mode=False,
                      workers=4):
    """Raw TFRecords -> KITTI-format tree. Needs the waymo devkit."""
    try:
        import tensorflow as tf
        from waymo_open_dataset import dataset_pb2
        from waymo_open_dataset.utils import frame_utils
    except ImportError as e:  # pragma: no cover - devkit not baked in
        raise ImportError(
            'convert_tfrecords needs waymo-open-dataset (+tensorflow), '
            'not part of this image; KITTI-format trees converted '
            'elsewhere are consumed fine by create_waymo_infos.') from e

    from glob import glob
    records = sorted(glob(os.path.join(load_dir, '*.tfrecord')))

    def one(file_idx):
        ds = tf.data.TFRecordDataset(records[file_idx],
                                     compression_type='')
        for frame_idx, data in enumerate(ds):
            proto = dataset_pb2.Frame()
            proto.ParseFromString(bytearray(data.numpy()))
            fd = _frame_to_dict(proto, frame_utils)
            sample = f'{prefix}{file_idx:03d}{frame_idx:03d}'
            convert_frame(fd, save_root, sample, test_mode=test_mode)

    with ThreadPoolExecutor(workers) as ex:
        list(ex.map(one, range(len(records))))
    return len(records)


def _frame_to_dict(proto, frame_utils):  # pragma: no cover - needs devkit
    """Waymo Frame proto -> the plain dict convert_frame consumes."""
    ri, cp, _, top_pose = \
        frame_utils.parse_range_image_and_camera_projection(proto)
    pts_all = []
    for ri_index in (0, 1):
        pts, _ = frame_utils.convert_range_image_to_point_cloud(
            proto, ri, cp, top_pose, ri_index=ri_index,
            keep_polar_features=True)
        # keep_polar_features rows: (range, intensity, elongation, x, y, z)
        for p in pts:
            pts_all.append(np.concatenate(
                [p[:, 3:6], p[:, 1:3],
                 np.zeros((len(p), 1), p.dtype)], 1))
    points = np.concatenate(pts_all, 0)

    id_to_bbox = {}
    for labels in proto.projected_lidar_labels:
        for lab in labels.labels:
            id_to_bbox[lab.id] = (labels.name - 1, [
                lab.box.center_x - lab.box.length / 2,
                lab.box.center_y - lab.box.width / 2,
                lab.box.center_x + lab.box.length / 2,
                lab.box.center_y + lab.box.width / 2])
    lidar_suffixes = ('_FRONT', '_FRONT_RIGHT', '_FRONT_LEFT',
                      '_SIDE_RIGHT', '_SIDE_LEFT')
    labels = []
    for obj in proto.laser_labels:
        cam_id, bbox2d = None, None
        for sfx in lidar_suffixes:
            if obj.id + sfx in id_to_bbox:
                cam_id, bbox2d = id_to_bbox[obj.id + sfx]
                break
        labels.append(dict(
            type=WAYMO_CLASSES[obj.type],
            box=[obj.box.center_x, obj.box.center_y, obj.box.center_z,
                 obj.box.length, obj.box.width, obj.box.height,
                 obj.box.heading],
            num_points=obj.num_lidar_points_in_box,
            camera_id=cam_id, bbox2d=bbox2d))

    cams = sorted(proto.context.camera_calibrations, key=lambda c: c.name)
    return dict(
        points=points,
        camera_calibs=[dict(
            extrinsic=np.array(c.extrinsic.transform).reshape(4, 4),
            intrinsic=list(c.intrinsic)) for c in cams],
        images={img.name - 1: img.image for img in proto.images},
        pose=np.array(proto.pose.transform).reshape(4, 4),
        timestamp=proto.timestamp_micros,
        labels=labels)


# ---------------------------------------------------------------------------
# stage 2: KITTI-format tree -> info pkls


def _parse_waymo_calib(path):
    """5-camera waymo calib txt -> 4x4 dict (kitti_data_utils.py:413)."""
    with open(path) as f:
        lines = [ln.strip() for ln in f if ln.strip()]
    vals = {k.strip(): np.array([float(x) for x in v.split()])
            for k, v in (ln.split(':', 1) for ln in lines)}

    def ext(mat):
        out = np.eye(4)
        out[:mat.shape[0], :mat.shape[1]] = mat
        return out

    calib = {f'P{i}': ext(vals[f'P{i}'].reshape(3, 4)) for i in range(5)}
    calib['R0_rect'] = ext(vals['R0_rect'].reshape(3, 3))
    calib['Tr_velo_to_cam'] = ext(
        vals['Tr_velo_to_cam_0'].reshape(3, 4))
    return calib


def waymo_scene_info(root, sub, sample, *, max_sweeps=5):
    """One frame's info dict (WaymoInfoGatherer.gather_single layout)."""
    from PIL import Image

    def rel(kind, ext):
        return os.path.join(sub, kind, f'{sample}{ext}')

    def full(kind, ext):
        return os.path.join(root, rel(kind, ext))

    info = dict(point_cloud=dict(num_features=6,
                                 velodyne_path=rel('velodyne', '.bin')))
    with open(full('timestamp', '.txt')) as f:
        info['timestamp'] = np.int64(f.read())
    image_info = dict(image_idx=int(sample),
                      image_path=rel('image_0', '.jpg'))
    img_path = full('image_0', '.jpg')
    if os.path.exists(img_path):
        with Image.open(img_path) as im:
            image_info['image_shape'] = np.array((im.height, im.width),
                                                 np.int32)
    info['image'] = image_info
    info['calib'] = _parse_waymo_calib(full('calib', '.txt'))
    info['pose'] = np.loadtxt(full('pose', '.txt'))

    label_path = full('label_all', '.txt')
    if os.path.exists(label_path):
        annos = parse_label(label_path)
        # waymo label_all lines end with the camera id in the score slot
        annos['camera_id'] = annos.pop('score')
        add_difficulty(annos)
        info['annos'] = annos

    sweeps = []
    prev = int(sample)
    while len(sweeps) < max_sweeps:
        prev -= 1
        psample = f'{prev:07d}'
        vp = rel('velodyne', '.bin').replace(sample, psample)
        if not os.path.exists(os.path.join(root, vp)):
            break
        with open(full('timestamp', '.txt').replace(sample,
                                                    psample)) as f:
            ts = np.int64(f.read())
        sweeps.append(dict(
            velodyne_path=vp, timestamp=ts,
            pose=np.loadtxt(full('pose', '.txt').replace(sample,
                                                         psample))))
    info['sweeps'] = sweeps
    return info


def _num_points_in_gt(root, info):
    """6-dim waymo variant of kitti.io.compute_num_points_in_gt."""
    from ..core import np_geometry as ng
    pts = np.fromfile(
        os.path.join(root, info['point_cloud']['velodyne_path']),
        np.float32).reshape(-1, 6)
    annos = info['annos']
    calib = info['calib']
    num_obj = int((annos['name'] != 'DontCare').sum())
    gt_cam = np.concatenate(
        [annos['location'][:num_obj], annos['dimensions'][:num_obj],
         annos['rotation_y'][:num_obj, None]], 1)
    gt_lidar = ng.box_camera_to_lidar(gt_cam, calib['R0_rect'],
                                      calib['Tr_velo_to_cam'])
    counts = ng.points_in_rbbox(pts[:, :3], gt_lidar).sum(0)
    annos['num_points_in_gt'] = np.concatenate(
        [counts, -np.ones(len(annos['name']) - num_obj)]).astype(np.int32)


def create_waymo_infos(root, out_dir=None, *, workers=8, max_sweeps=5,
                       prefix='waymo'):
    """KITTI-format waymo tree (+ImageSets) -> waymo_infos_{split}.pkl.

    If ``root/waymo_format`` holds raw TFRecord splits and the devkit is
    installed, converts them into ``root/kitti_format`` first; otherwise
    consumes an existing kitti_format tree directly.
    """
    out_dir = out_dir or root
    kroot = os.path.join(root, 'kitti_format') \
        if os.path.isdir(os.path.join(root, 'kitti_format')) else root
    raw = os.path.join(root, 'waymo_format')
    if os.path.isdir(raw) and not os.path.isdir(
            os.path.join(kroot, 'training', 'velodyne')):
        kroot = os.path.join(root, 'kitti_format')
        for i, split in enumerate(('training', 'validation', 'testing')):
            d = os.path.join(raw, split)
            if os.path.isdir(d):
                convert_tfrecords(d, kroot, str(i),
                                  test_mode=split == 'testing',
                                  workers=workers)

    os.makedirs(out_dir, exist_ok=True)
    out_paths = {}
    for split in ('train', 'val', 'test'):
        ids_file = os.path.join(kroot, 'ImageSets', f'{split}.txt')
        if not os.path.exists(ids_file):
            continue
        with open(ids_file) as f:
            samples = [ln.strip() for ln in f if ln.strip()]
        sub = 'testing' if split == 'test' else 'training'

        def one(s):
            info = waymo_scene_info(kroot, sub, s, max_sweeps=max_sweeps)
            if 'annos' in info:
                _num_points_in_gt(kroot, info)
            return info

        with ThreadPoolExecutor(workers) as ex:
            infos = list(ex.map(one, samples))
        path = os.path.join(out_dir, f'{prefix}_infos_{split}.pkl')
        with open(path, 'wb') as f:
            pickle.dump(infos, f)
        print(f'saved {path}')
        out_paths[split] = path
    return out_paths
