"""NuScenesMono coco-json dataset."""
import json

import numpy as np

from gga_tpu.data.nuscenes_mono import (ATTRIBUTES, IMG_H, IMG_W,
                                        NuScenesMonoDataset)


def _fixture(tmp_path):
    from PIL import Image
    img = np.random.RandomState(0).randint(
        0, 255, (64, 96, 3)).astype(np.uint8)
    Image.fromarray(img).save(tmp_path / 'cam0.jpg')
    coco = dict(
        images=[dict(id=1, file_name='cam0.jpg',
                     cam_intrinsic=[[800, 0, 48], [0, 800, 32],
                                    [0, 0, 1]])],
        categories=[dict(id=10, name='car'), dict(id=11, name='truck')],
        annotations=[dict(
            image_id=1, category_id=10, bbox=[10, 12, 30, 20],
            bbox_cam3d=[1.0, 0.5, 20.0, 4.0, 1.5, 1.8, 0.3],
            center2d=[25.0, 22.0, 20.0],
            velo_cam3d=[1.0, float('nan')],
            attribute_name='vehicle.moving')])
    path = tmp_path / 'nus_mono3d.coco.json'
    with open(path, 'w') as f:
        json.dump(coco, f)
    return str(path)


def test_sample_layout(tmp_path):
    ann = _fixture(tmp_path)
    ds = NuScenesMonoDataset(str(tmp_path), ann, max_objs=4)
    assert len(ds) == 1
    s = ds[0]
    assert s['img'].shape == (IMG_H, IMG_W, 3)
    assert s['obj_valid'].sum() == 1
    box = s['gt_boxes_cam'][0]
    # gravity -> bottom center: y 0.5 + 1.5/2 = 1.25
    np.testing.assert_allclose(box[:3], [1.0, 1.25, 20.0], atol=1e-6)
    np.testing.assert_allclose(s['gt_bboxes2d'][0], [10, 12, 40, 32])
    np.testing.assert_allclose(s['centers2d'][0], [25, 22])
    assert s['depths'][0] == 20.0
    np.testing.assert_allclose(s['gt_velocities'][0], [1.0, 0.0])
    assert int(s['gt_attrs'][0]) == ATTRIBUTES.index('vehicle.moving')
    assert int(s['gt_labels'][0]) == 0
    batch = next(ds.epoch_batches(1))
    assert batch['cam2img'].shape == (1, 4, 4)
