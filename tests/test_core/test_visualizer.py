import numpy as np

from gga_tpu.core.visualizer import (show_bev_result,
                                     show_multi_modality_result,
                                     show_result)


def test_bev_and_image_plots(tmp_path):
    rng = np.random.RandomState(0)
    pts = rng.uniform(0, 40, (500, 3)).astype(np.float32)
    boxes = np.array([[20.0, 0.0, -1.7, 3.9, 1.6, 1.55, 0.3]])
    out = show_result(pts, boxes, boxes, str(tmp_path), 'scene0')
    assert (tmp_path / 'scene0_bev.png').exists()

    img = np.zeros((375, 1242, 3), np.uint8)
    P = np.eye(4)
    P[0, 0] = P[1, 1] = 700.0
    P[0, 2], P[1, 2] = 620, 180
    cam = np.array([[1.0, 1.5, 15.0, 3.9, 1.56, 1.6, 0.3]])
    out2 = show_multi_modality_result(img, cam, P,
                                      str(tmp_path / 'proj.png'))
    assert (tmp_path / 'proj.png').exists()
