"""Print the fully-merged config (equivalent of
/root/reference/tools/misc/print_config.py)."""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from gga_tpu.config import Config  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument('config')
    p.add_argument('--cfg-options', nargs='*', default=[])
    args = p.parse_args()
    cfg = Config.fromfile(args.config)
    cfg.merge_from_options(
        dict(kv.split('=', 1) for kv in args.cfg_options))
    print(cfg.dump())


if __name__ == '__main__':
    main()
