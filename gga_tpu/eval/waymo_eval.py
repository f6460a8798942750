"""Waymo-protocol submission + evaluation.

Rebuild of /root/reference/mmdet3d/core/evaluation/waymo_utils/
prediction_kitti_to_waymo.py:23 (KITTI2Waymo) without the TFRecord
dependency: the kitti->waymo frame transform is the exact inverse of the
waymo->kitti converter (gga_tpu/data/waymo_converter.py), i.e.
``T_k2w = inv(Tr_velo_to_cam_0)``, and Tr_velo_to_cam_0 + the frame
timestamp live in the converted KITTI-format tree — so waymo-frame
objects are recovered devkit-free and verified by round-trip against the
converter. Only the metrics_pb2 serialization (.bin submission) and the
official mAP/mAPH computation (the devkit's
``compute_detection_metrics_main`` binary) are gated on the external
waymo-open-dataset install, mirroring the reference's hard dependency.
"""
from __future__ import annotations

import os
import pickle
import subprocess

import numpy as np

# kitti reference cam (z fwd, y down) -> waymo front cam (x fwd);
# inverse of waymo_converter.T_FRONT_CAM_TO_REF
T_REF_TO_FRONT_CAM = np.array([[0.0, 0.0, 1.0, 0.0],
                               [-1.0, 0.0, 0.0, 0.0],
                               [0.0, -1.0, 0.0, 0.0],
                               [0.0, 0.0, 0.0, 1.0]])

# waymo label_pb2.Label enum values (TYPE_VEHICLE=1, ...)
K2W_TYPE = {'Car': 1, 'Pedestrian': 2, 'Sign': 3, 'Cyclist': 4}


def kitti_anno_to_waymo_objects(anno, t_k2w, *, context_name='',
                                timestamp=0):
    """One KITTI-format prediction anno -> waymo-frame object dicts.

    Mirrors KITTI2Waymo.parse_objects (prediction_kitti_to_waymo.py:90):
    bottom-center -> volumetric center (y -= h/2 in cam frame), kitti
    cam frame -> waymo vehicle frame via ``t_k2w``, and
    ``heading = -(rotation_y + pi/2)`` wrapped to [-pi, pi].
    """
    objs = []
    n = len(anno['name'])
    for i in range(n):
        l, h, w = anno['dimensions'][i]  # kitti lhw order (parse_label)
        x, y, z = anno['location'][i]
        y = y - h / 2
        xw, yw, zw, _ = t_k2w @ np.array([x, y, z, 1.0])
        heading = -(float(anno['rotation_y'][i]) + np.pi / 2)
        heading = (heading + np.pi) % (2 * np.pi) - np.pi
        objs.append(dict(
            box=np.array([xw, yw, zw, l, w, h, heading]),
            type=K2W_TYPE.get(str(anno['name'][i]), 0),
            score=float(anno['score'][i]) if 'score' in anno else 0.0,
            context_name=context_name,
            frame_timestamp_micros=int(timestamp)))
    return objs


def t_k2w_from_calib(calib):
    """kitti->waymo vehicle transform from a converted frame's calib:
    Tr_velo_to_cam_0 = T_front_ref @ inv(T_front_cam_to_vehicle), and
    the waymo 'velodyne' frame IS the vehicle frame, so
    T_k2w = inv(Tr_velo_to_cam_0)."""
    return np.linalg.inv(np.asarray(calib['Tr_velo_to_cam']))


def create_waymo_submission(kitti_results, infos, out_path, *,
                            context_names=None):
    """Detections (KITTI-format annos aligned with ``infos`` from
    create_waymo_infos) -> a waymo submission.

    Writes the official ``metrics_pb2.Objects`` .bin when the devkit is
    installed; otherwise a pickle of the same object dicts (every field
    the proto carries) so results survive for later serialization.
    Returns the list of object dicts.
    """
    all_objs = []
    for i, (res, info) in enumerate(zip(kitti_results, infos)):
        t_k2w = t_k2w_from_calib(info['calib'])
        ctx = context_names[i] if context_names else ''
        all_objs.extend(kitti_anno_to_waymo_objects(
            res, t_k2w, context_name=ctx,
            timestamp=int(info.get('timestamp', 0))))

    os.makedirs(os.path.dirname(out_path) or '.', exist_ok=True)
    try:  # pragma: no cover - devkit not baked into this image
        from waymo_open_dataset.protos import metrics_pb2
        objects = metrics_pb2.Objects()
        for o in all_objs:
            m = metrics_pb2.Object()
            (m.object.box.center_x, m.object.box.center_y,
             m.object.box.center_z) = o['box'][:3]
            (m.object.box.length, m.object.box.width,
             m.object.box.height) = o['box'][3:6]
            m.object.box.heading = o['box'][6]
            m.object.type = o['type']  # enum values mirrored in K2W_TYPE
            m.score = o['score']
            m.context_name = o['context_name']
            m.frame_timestamp_micros = o['frame_timestamp_micros']
            objects.objects.append(m)
        with open(out_path, 'wb') as f:
            f.write(objects.SerializeToString())
    except ImportError:
        with open(out_path + '.pkl', 'wb') as f:
            pickle.dump(all_objs, f)
    return all_objs


def waymo_official_eval(pred_bin, gt_bin,
                        binary='compute_detection_metrics_main'):
    """Official waymo mAP/mAPH via the devkit's metrics binary (the
    reference's waymo_utils path shells out the same way). Raises with
    install guidance when the binary is absent."""
    import shutil
    if shutil.which(binary) is None:
        raise RuntimeError(
            f'{binary} not found: the official Waymo metric needs the '
            'waymo-open-dataset devkit (external, TF-based). The '
            'kitti-protocol AP on the same predictions is available via '
            'gga_tpu.eval.kitti_eval.')
    out = subprocess.run([binary, pred_bin, gt_bin],
                         capture_output=True, text=True, check=True)
    metrics = {}
    for line in out.stdout.splitlines():
        if ':' in line and 'mAP' in line:
            k, v = line.rsplit(':', 1)
            try:
                metrics[k.strip()] = float(v.split(']')[-1])
            except ValueError:
                pass
    return metrics
