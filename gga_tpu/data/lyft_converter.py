"""Lyft L5 raw -> info pkl converter (requires lyft-dataset-sdk).

Rebuild of /root/reference/tools/data_converter/lyft_converter.py:19
(create_lyft_infos / _fill_trainval_infos). The Lyft devkit mirrors the
nuScenes record schema (`get`, `get_sample_data_path`, `get_box`), so
the per-sample info assembly is shared with the nuScenes converter
(`gga_tpu.data.nuscenes_converter._sample_info`); only the split source
(scene-name txt lists) and the flat 9-class name map differ. Like the
reference, Lyft carries no velocity annotations — `_sample_info`'s
`box_velocity` falls back to zeros via nan_to_num, and `LyftDataset`
(gga_tpu/data/nuscenes.py:223) loads with `with_velocity=False`.

The devkit is not baked into this image; the import is gated at call
time so the module stays importable without it.
"""
from __future__ import annotations

import os
import pickle

from .nuscenes_converter import _sample_info

LYFT_CLASSES = ('car', 'truck', 'bus', 'emergency_vehicle',
                'other_vehicle', 'motorcycle', 'bicycle', 'pedestrian',
                'animal')
# lyft category names are already the 9 detection classes
LYFT_NAME_MAP = {c: c for c in LYFT_CLASSES}


def _read_scene_list(path):
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return [ln.strip() for ln in f if ln.strip()]


def create_lyft_infos(root_path, out_dir, version='v1.01-train',
                      max_sweeps=10):
    """Build lyft_infos_{train,val}.pkl. Gated on the lyft devkit.

    Scene splits come from ``{root_path}/{train,val}.txt`` (scene-name
    lists, the layout the reference reads from data/lyft); scenes in
    neither list fall into val like the reference's else-branch.
    """
    try:
        from lyft_dataset_sdk.lyftdataset import LyftDataset as Lyft
    except ImportError as e:  # pragma: no cover - devkit not baked in
        raise ImportError(
            'create_lyft_infos needs lyft-dataset-sdk '
            '(pip install lyft_dataset_sdk), not part of this image; '
            'info pkls built elsewhere load fine.') from e

    lyft = Lyft(data_path=os.path.join(root_path, version),
                json_path=os.path.join(root_path, version, version),
                verbose=True)
    test = 'test' in version
    train_names = _read_scene_list(
        os.path.join(root_path, 'test.txt' if test else 'train.txt'))
    scene_by_token = {s['token']: s['name'] for s in lyft.scene}
    train_names = set(train_names if train_names is not None
                      else scene_by_token.values())

    train_infos, val_infos = [], []
    for sample in lyft.sample:
        info = _sample_info(lyft, sample, max_sweeps,
                            name_map=LYFT_NAME_MAP)
        name = scene_by_token[sample['scene_token']]
        (train_infos if name in train_names else val_infos).append(info)

    os.makedirs(out_dir, exist_ok=True)
    meta = dict(version=version)
    out = {}
    for split, infos in (('train', train_infos), ('val', val_infos)):
        if not infos and not test:
            continue
        path = os.path.join(out_dir, f'lyft_infos_{split}.pkl')
        with open(path, 'wb') as f:
            pickle.dump(dict(infos=infos, metadata=meta), f)
        print(f'{split}: {len(infos)} infos -> {path}')
        out[split] = path
    return out
