"""nuScenes raw -> info pkl converter (requires nuscenes-devkit).

Rebuild of /root/reference/tools/data_converter/nuscenes_converter.py:1
(create_nuscenes_infos / _fill_trainval_infos): walks samples, records
the key lidar path + calibration chain (lidar2ego, ego2global), up to
``max_sweeps`` previous sweeps with their sensor2lidar transforms, and
GT boxes in the key lidar frame (gravity center, devkit convention)
with names, global-frame velocities rotated into lidar, per-box lidar
point counts and valid flags.

The devkit is NOT a baked-in dependency of this image; the import is
gated at call time so the module stays importable (and the schema
documented/testable) without it.
"""
from __future__ import annotations

import os
import pickle

import numpy as np

NAME_MAP = {
    'movable_object.barrier': 'barrier',
    'vehicle.bicycle': 'bicycle',
    'vehicle.bus.bendy': 'bus',
    'vehicle.bus.rigid': 'bus',
    'vehicle.car': 'car',
    'vehicle.construction': 'construction_vehicle',
    'vehicle.motorcycle': 'motorcycle',
    'human.pedestrian.adult': 'pedestrian',
    'human.pedestrian.child': 'pedestrian',
    'human.pedestrian.construction_worker': 'pedestrian',
    'human.pedestrian.police_officer': 'pedestrian',
    'movable_object.trafficcone': 'traffic_cone',
    'vehicle.trailer': 'trailer',
    'vehicle.truck': 'truck',
}


def _quat_to_mat(q):
    """[w, x, y, z] quaternion -> rotation matrix (no external dep)."""
    w, x, y, z = q
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z),
         2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z),
         2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x),
         1 - 2 * (x * x + y * y)]])


def create_nuscenes_infos(root_path, out_dir, version='v1.0-trainval',
                          max_sweeps=10):
    """Build {split}_infos pkls. Gated on the nuscenes devkit."""
    try:
        from nuscenes.nuscenes import NuScenes
        from nuscenes.utils import splits
    except ImportError as e:  # pragma: no cover - devkit not baked in
        raise ImportError(
            'create_nuscenes_infos needs the nuscenes-devkit '
            '(pip install nuscenes-devkit) which is not part of this '
            'image; info pkls built elsewhere load fine.') from e

    nusc = NuScenes(version=version, dataroot=root_path, verbose=True)
    if 'mini' in version:
        train_scenes = set(splits.mini_train)
        val_scenes = set(splits.mini_val)
    elif 'test' in version:
        train_scenes = set(splits.test)
        val_scenes = set()
    else:
        train_scenes = set(splits.train)
        val_scenes = set(splits.val)

    train_infos, val_infos = [], []
    for sample in nusc.sample:
        scene = nusc.get('scene', sample['scene_token'])['name']
        if scene not in train_scenes and scene not in val_scenes:
            continue
        info = _sample_info(nusc, sample, max_sweeps)
        (train_infos if scene in train_scenes else val_infos).append(info)

    os.makedirs(out_dir, exist_ok=True)
    meta = dict(version=version)
    for split, infos in (('train', train_infos), ('val', val_infos)):
        if not infos and 'test' not in version:
            continue
        path = os.path.join(out_dir, f'nuscenes_infos_{split}.pkl')
        with open(path, 'wb') as f:
            pickle.dump(dict(infos=infos, metadata=meta), f)
        print(f'{split}: {len(infos)} infos -> {path}')


def _sample_info(nusc, sample, max_sweeps, name_map=None):
    name_map = NAME_MAP if name_map is None else name_map
    lidar_token = sample['data']['LIDAR_TOP']
    sd = nusc.get('sample_data', lidar_token)
    cs = nusc.get('calibrated_sensor', sd['calibrated_sensor_token'])
    pose = nusc.get('ego_pose', sd['ego_pose_token'])
    lidar_path = nusc.get_sample_data_path(lidar_token)

    l2e_r = _quat_to_mat(cs['rotation'])
    e2g_r = _quat_to_mat(pose['rotation'])
    info = dict(
        token=sample['token'],
        lidar_path=lidar_path,
        timestamp=sample['timestamp'],
        lidar2ego_rotation_matrix=l2e_r,
        lidar2ego_translation=np.asarray(cs['translation']),
        ego2global_rotation_matrix=e2g_r,
        ego2global_translation=np.asarray(pose['translation']),
        sweeps=[],
    )

    # previous sweeps chained into the key lidar frame
    sd_iter = sd
    key_from_global = np.linalg.inv(
        _chain(e2g_r, pose['translation'], l2e_r, cs['translation']))
    while len(info['sweeps']) < max_sweeps and sd_iter['prev']:
        sd_iter = nusc.get('sample_data', sd_iter['prev'])
        cs_s = nusc.get('calibrated_sensor',
                        sd_iter['calibrated_sensor_token'])
        pose_s = nusc.get('ego_pose', sd_iter['ego_pose_token'])
        sweep_to_global = _chain(
            _quat_to_mat(pose_s['rotation']), pose_s['translation'],
            _quat_to_mat(cs_s['rotation']), cs_s['translation'])
        t = key_from_global @ sweep_to_global
        info['sweeps'].append(dict(
            data_path=nusc.get_sample_data_path(sd_iter['token']),
            timestamp=sd_iter['timestamp'],
            sensor2lidar_rotation=t[:3, :3],
            sensor2lidar_translation=t[:3, 3]))

    # GT boxes in the key lidar frame (devkit gravity-center convention)
    boxes, names, vels, npts, valid = [], [], [], [], []
    for tok in sample['anns']:
        ann = nusc.get('sample_annotation', tok)
        name = name_map.get(ann['category_name'])
        if name is None:
            continue
        box = nusc.get_box(tok)
        # global -> lidar
        g2l = key_from_global
        center = g2l[:3, :3] @ np.asarray(box.center) + g2l[:3, 3]
        rot = g2l[:3, :3] @ box.rotation_matrix
        yaw = np.arctan2(rot[1, 0], rot[0, 0])
        w, l, h = box.wlh
        boxes.append([*center, l, w, h, yaw])
        names.append(name)
        v = nusc.box_velocity(tok)[:2]
        vels.append(g2l[:2, :2] @ np.nan_to_num(v))
        n = ann['num_lidar_pts'] + ann['num_radar_pts']
        npts.append(ann['num_lidar_pts'])
        valid.append(n > 0)
    info.update(
        gt_boxes=np.asarray(boxes, np.float64).reshape(-1, 7),
        gt_names=np.asarray(names),
        gt_velocity=np.asarray(vels, np.float64).reshape(-1, 2),
        num_lidar_pts=np.asarray(npts, np.int64),
        valid_flag=np.asarray(valid, bool))
    return info


def _chain(r_outer, t_outer, r_inner, t_inner):
    """4x4 of outer @ inner (sensor -> ego -> global)."""
    m_o = np.eye(4)
    m_o[:3, :3] = r_outer
    m_o[:3, 3] = t_outer
    m_i = np.eye(4)
    m_i[:3, :3] = r_inner
    m_i[:3, 3] = t_inner
    return m_o @ m_i
