"""Strip a training checkpoint for release (equivalent of
/root/reference/tools/model_converters/publish_model.py): drop the
optimizer state, keep params + batch stats, and stamp the output name
with a content hash.

Usage:
    python tools/model_converters/publish_model.py work_dirs/gga/ckpt \
        gga_kitti_release
"""
import argparse
import hashlib
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))


def publish(ckpt_dir, out_prefix, step=None):
    import jax
    import orbax.checkpoint as ocp

    from gga_tpu.train.checkpoints import latest_step

    step = latest_step(ckpt_dir) if step is None else step
    if step is None:
        raise SystemExit(f'no checkpoints under {ckpt_dir}')
    ckptr = ocp.StandardCheckpointer()
    payload = ckptr.restore(
        os.path.join(os.path.abspath(ckpt_dir), str(step), 'default'))
    release = dict(params=payload['params'],
                   batch_stats=payload.get('batch_stats', {}),
                   step=int(step))
    release = jax.tree_util.tree_map(lambda x: x, release)

    blob = pickle.dumps(release)
    sha = hashlib.sha256(blob).hexdigest()[:8]
    out = f'{out_prefix}-{sha}.pkl'
    with open(out, 'wb') as f:
        f.write(blob)
    print(f'published {out} (step {step}, sha256[:8]={sha})')
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument('ckpt_dir')
    p.add_argument('out_prefix')
    p.add_argument('--step', type=int, default=None)
    args = p.parse_args()
    publish(args.ckpt_dir, args.out_prefix, args.step)


if __name__ == '__main__':
    main()
