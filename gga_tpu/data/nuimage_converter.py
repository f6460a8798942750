"""nuImages -> COCO-format converter (requires nuimages devkit).

Rebuild of /root/reference/tools/data_converter/nuimage_converter.py
(export_nuim_to_coco / get_img_annos) without mmcv: per keyframe image,
object annotations become COCO instances (bbox xywh + RLE segmentation,
nuScenes 10-class name mapping) and the surface+object masks render a
semantic png; the output json drives 2D instance-seg training exactly
like the reference's nuimages configs.

The devkit (`pip install nuimages` / nuscenes-devkit) is external, like
the other devkit-gated converters; COCO jsons built elsewhere load fine.
"""
from __future__ import annotations

import base64
import json
import os

import numpy as np

NAME_MAPPING = {
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
CLASSES = ('car', 'truck', 'trailer', 'bus', 'construction_vehicle',
           'bicycle', 'motorcycle', 'pedestrian', 'barrier',
           'traffic_cone')


def coco_instance_from_object_ann(ann, category_name, cat2id, image_id):
    """One devkit object_ann record -> COCO instance dict (pure)."""
    if category_name not in NAME_MAPPING or ann.get('mask') is None:
        return None
    x0, y0, x1, y1 = ann['bbox']
    return dict(
        image_id=image_id,
        category_id=cat2id[NAME_MAPPING[category_name]],
        bbox=[x0, y0, x1 - x0, y1 - y0],
        area=(x1 - x0) * (y1 - y0),
        segmentation=dict(
            counts=base64.b64decode(ann['mask']['counts']).decode(),
            size=ann['mask']['size']),
        iscrowd=0)


def export_nuim_to_coco(data_root, out_dir, *, version='v1.0-mini',
                        extra_tag='nuimages', with_seg=True):
    """Keyframe images + object anns -> COCO json (+ semantic pngs)."""
    try:
        from nuimages import NuImages
        from nuimages.utils.utils import mask_decode, name_to_index_mapping
    except ImportError as e:  # pragma: no cover - devkit not baked in
        raise ImportError(
            'export_nuim_to_coco needs the nuimages devkit '
            '(pip install nuscenes-devkit), not part of this image; '
            'COCO jsons built elsewhere load fine.') from e

    nuim = NuImages(dataroot=data_root, version=version, verbose=True)
    cat2id = {c: i for i, c in enumerate(CLASSES)}
    name_to_index = name_to_index_mapping(nuim.category)
    cat_name = {c['token']: c['name'] for c in nuim.category}

    images, annotations = [], []
    seg_root = os.path.join(out_dir, 'semantic_masks')
    for img_id, sd in enumerate(nuim.sample_data):
        if not sd['is_key_frame'] or not sd['fileformat'] == 'jpg':
            continue
        images.append(dict(
            id=img_id, token=sd['token'], file_name=sd['filename'],
            width=sd['width'], height=sd['height']))
        semseg = np.zeros((sd['height'], sd['width']), np.uint8)
        for ann in nuim.surface_ann:
            if ann['sample_data_token'] != sd['token'] or \
                    ann.get('mask') is None:
                continue
            semseg[mask_decode(ann['mask']) == 1] = \
                name_to_index[cat_name[ann['category_token']]]
        objs = sorted((o for o in nuim.object_ann
                       if o['sample_data_token'] == sd['token']),
                      key=lambda k: k['token'])
        for ann in objs:
            if ann.get('mask') is not None:
                semseg[mask_decode(ann['mask']) == 1] = \
                    name_to_index[cat_name[ann['category_token']]]
            inst = coco_instance_from_object_ann(
                ann, cat_name[ann['category_token']], cat2id, img_id)
            if inst is not None:
                inst['id'] = len(annotations)
                annotations.append(inst)
        if with_seg:
            from PIL import Image
            seg_path = os.path.join(
                seg_root, sd['filename'].replace('jpg', 'png'))
            os.makedirs(os.path.dirname(seg_path), exist_ok=True)
            Image.fromarray(semseg).save(seg_path)

    coco = dict(
        images=images, annotations=annotations,
        categories=[dict(id=i, name=c) for i, c in enumerate(CLASSES)])
    os.makedirs(out_dir, exist_ok=True)
    out = os.path.join(out_dir,
                       f'{extra_tag}_{version.replace("/", "-")}.json')
    with open(out, 'w') as f:
        json.dump(coco, f)
    print(f'saved {out}: {len(images)} images, '
          f'{len(annotations)} instances')
    return out
