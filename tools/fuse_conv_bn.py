"""Fold BN statistics into conv kernels in a checkpoint (equivalent of
/root/reference/tools/misc/fuse_conv_bn.py; see
gga_tpu/utils/fuse_conv_bn.py for the variable-rewrite mechanics).

Usage:
    python tools/fuse_conv_bn.py configs/gga/gga_kitti.py \
        --checkpoint work_dirs/kitti_GGA/checkpoints --out fused_ckpt
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument('config')
    p.add_argument('--checkpoint', required=True)
    p.add_argument('--out', required=True)
    args = p.parse_args()

    from gga_tpu.config import Config
    from gga_tpu.tools_lib import build_model_from_cfg
    from gga_tpu.train import checkpoints as ckpt
    from gga_tpu.utils.fuse_conv_bn import fuse_conv_bn

    cfg = Config.fromfile(args.config)
    model, model_cfg, state = build_model_from_cfg(cfg, args.checkpoint)
    params, stats, n = fuse_conv_bn(state.params, state.batch_stats)
    print(f'fused {n} conv+BN pairs')
    state = state.replace(params=params, batch_stats=stats)
    ckpt.save(args.out, state, step=int(state.step))
    print(f'-> {args.out}')


if __name__ == '__main__':
    main()
