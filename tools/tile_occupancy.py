"""Tile-occupancy statistics for the dense-tile subm engine.

The tile engine's win condition is actives CLUSTERING: it replaces the
27*N row gather with 26*T tile-slab gathers plus a dense conv over
T * tile_cells cells, so it needs (a) T << N descriptors and (b) the
dense-FLOP inflation tile_cells * T / N to stay MXU-cheap. This tool
reports, per encoder stage, the occupied-tile count T, actives/tile,
gather-row ratio, and FLOP inflation for candidate tile shapes — on the
throughput bench's frustum scenes and (if present) the accuracy bench's
generated surface scenes.
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

GRID0 = (41, 1600, 1408)
VOX = np.array([0.1, 0.05, 0.05]) * np.array([1, 2, 2])  # z,y,x = .1,.1,.1
RANGE_LO = np.array([-3.0, -40.0, 0.0])  # z,y,x lidar
BUDGETS = [16000, 16000, 14000, 12000]


def voxelize(pts, cap=16000):
    # (z, y, x) cells like ops/voxelize.py, 0.1 m
    c = np.stack([(pts[:, 2] - RANGE_LO[0]) / 0.1,
                  (pts[:, 1] - RANGE_LO[1]) / 0.1,
                  (pts[:, 0] - RANGE_LO[2]) / 0.1], -1).astype(np.int64)
    nz, ny, nx = GRID0
    ok = ((c >= 0).all(-1) & (c[:, 0] < nz) & (c[:, 1] < ny)
          & (c[:, 2] < nx))
    c = c[ok]
    lin = np.unique(c[:, 0] * ny * nx + c[:, 1] * nx + c[:, 2])
    return lin[:cap]


def downsample(lin, grid):
    """k3 s2 p1 strided-conv active set: per dim each input c covers
    outputs o with (c-1)/2 <= o <= (c+1)/2."""
    nz, ny, nx = grid
    z, y, x = lin // (ny * nx), (lin // nx) % ny, lin % nx
    og = (-(-nz // 2), -(-ny // 2), -(-nx // 2))
    outs = []
    for dz in (-1, 0, 1):
        oz = (z + dz + 1) // 2
        if dz:
            mz = (z + dz) % 2 == 1
        else:
            mz = np.ones_like(z, bool)
        for dy in (-1, 0, 1):
            oy = (y + dy + 1) // 2
            my = mz & ((y + dy) % 2 == 1 if dy else True)
            for dx in (-1, 0, 1):
                ox = (x + dx + 1) // 2
                m = my & ((x + dx) % 2 == 1 if dx else True)
                m = m & (oz >= 0) & (oz < og[0]) & (oy >= 0) \
                    & (oy < og[1]) & (ox >= 0) & (ox < og[2])
                outs.append((oz[m] * og[1] * og[2] + oy[m] * og[2]
                             + ox[m]))
    return np.unique(np.concatenate(outs)), og


def tile_stats(lin, grid, budget, name):
    nz, ny, nx = grid
    z, y, x = lin // (ny * nx), (lin // nx) % ny, lin % nx
    n = min(len(lin), budget)
    z, y, x = z[:n], y[:n], x[:n]
    print(f'{name}: grid={grid} actives={len(lin)} (budget {budget})')
    for tile in [(4, 4, 4), (2, 4, 4), (2, 8, 8), (4, 8, 8), (1, 8, 8)]:
        tz, ty, tx = tile
        gy, gx = -(-ny // ty), -(-nx // tx)
        tl = (z // tz) * gy * gx + (y // ty) * gx + (x // tx)
        T = len(np.unique(tl))
        cells = tz * ty * tx
        rows_row_engine = 27 * n
        rows_tile = 26 * T          # tile-slab gather descriptors
        flop_inflation = cells * T / max(n, 1)
        print(f'  tile {tile}: T={T:6d}  act/tile={n / T:5.2f}  '
              f'gather-descr ratio={rows_row_engine / rows_tile:5.1f}x  '
              f'FLOP x{flop_inflation:5.1f}')


def run_scene(pts, label):
    print(f'=== {label} ({len(pts)} pts) ===')
    lin = voxelize(pts)
    grid = GRID0
    for s in range(4):
        tile_stats(lin, grid, BUDGETS[s], f'stage{s}')
        if s < 3:
            lin, grid = downsample(lin, grid)
            lin = lin[:BUDGETS[s + 1]]


def bench_scene():
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from bench import make_batch
    b = make_batch(1, 20000, 500, 256)
    return b['points'][0]


def main():
    run_scene(bench_scene(), 'bench frustum scene (uniform)')
    root = '/tmp/gga_accuracy_kitti/training/velodyne'
    if os.path.isdir(root):
        f = sorted(os.listdir(root))[0]
        pts = np.fromfile(os.path.join(root, f),
                          np.float32).reshape(-1, 4)
        run_scene(pts, f'accuracy surface scene {f}')
    else:
        print('(no accuracy scenes at /tmp/gga_accuracy_kitti)')


if __name__ == '__main__':
    main()
