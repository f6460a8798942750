"""Rank the train step's HLO instructions by output-buffer bytes.

The roofline estimate (tools/mfu_estimate.py) says the batch-8 step
accesses ~219 GB at ~48% HBM utilization — the byte FLOOR, not the MXU,
is what caps throughput (~30 scenes/s even with perfect overlap). This
tool attributes those bytes: it lowers the full-size train step on CPU,
walks the optimized HLO, and sums output-buffer sizes by opcode plus the
top single instructions, so byte-reduction work (dtype, remat, layout)
targets the real movers instead of guesses.

Output bytes only (operand reads overlap producers' writes; the ranking
is what matters, not absolute GB). CPU fusion boundaries differ from
TPU's, but gather/scatter/sort/dot/convolution survive fusion and those
are the candidates.

Usage: python tools/hlo_bytes.py [--b 8] [--top 30]
"""
import argparse
import collections
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

_DT_BYTES = {'f64': 8, 'f32': 4, 'bf16': 2, 'f16': 2, 's64': 8, 'u64': 8,
             's32': 4, 'u32': 4, 's16': 2, 'u16': 2, 's8': 1, 'u8': 1,
             'pred': 1, 'c64': 8, 'c128': 16}

_SHAPE_RE = re.compile(r'\b([a-z]+\d*|pred)\[([\d,]*)\]')


def shape_bytes(text):
    """Sum buffer sizes of every shape literal in an HLO result type
    (handles tuples by summing members)."""
    total = 0
    for dt, dims in _SHAPE_RE.findall(text):
        if dt not in _DT_BYTES:
            continue
        n = 1
        for d in dims.split(','):
            if d:
                n *= int(d)
        total += n * _DT_BYTES[dt]
    return total


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--b', type=int, default=8)
    ap.add_argument('--top', type=int, default=30)
    args = ap.parse_args()

    import jax

    jax.config.update('jax_platforms', 'cpu')

    from bench import make_batch
    from gga_tpu.models.dense_heads.centerpoint_head_gga import GGAHeadConfig
    from gga_tpu.models.detectors.centerpoint_gga import (GGAModelConfig,
                                                          GGADetector)
    from gga_tpu.train.loop import create_train_state, gga_train_step
    from gga_tpu.train.optim import build_optimizer

    B = args.b
    head = GGAHeadConfig(max_objs=500)
    cfg = GGAModelConfig(head=head, compute_dtype='bfloat16')
    model = GGADetector(cfg)
    batch = make_batch(B, 20000, 500, 256)
    variables = model.init(jax.random.PRNGKey(0), batch['points'][:1],
                           batch['points_valid'][:1], train=False)
    state = create_train_state(model, variables,
                               build_optimizer(total_steps=1000))
    rng = jax.random.PRNGKey(1)

    def step(s, b):
        s2, logs = gga_train_step(s, b, rng, cfg.head)
        return s2, logs['loss']

    hlo = jax.jit(step).lower(state, batch).compile().as_text()

    by_op = collections.Counter()
    count_op = collections.Counter()
    instrs = []
    # instruction lines look like:  %name = TYPE opcode(...), ...
    line_re = re.compile(r'^\s*(?:ROOT )?[%\w.\-]+ = (.+?) ([\w\-]+)\(')
    for line in hlo.splitlines():
        m = line_re.match(line)
        if not m:
            continue
        rtype, op = m.groups()
        if op in ('parameter', 'constant', 'tuple', 'get-tuple-element',
                  'bitcast'):
            continue
        nbytes = shape_bytes(rtype)
        if not nbytes:
            continue
        # attribute fusions by their dominant inner op when obvious
        label = op
        if op == 'fusion':
            for inner in ('scatter', 'gather', 'sort', 'dot',
                          'convolution'):
                if f' {inner}(' in line or f'.{inner}.' in line:
                    label = f'fusion:{inner}'
                    break
        by_op[label] += nbytes
        count_op[label] += 1
        instrs.append((nbytes, label, line.strip()[:140]))

    total = sum(by_op.values())
    print(f'total HLO output bytes (batch {B}): {total / 1e9:.2f} GB '
          f'across {sum(count_op.values())} instructions')
    print('\n-- by opcode --')
    for op, nb in by_op.most_common(20):
        print(f'{op:24s} {nb / 1e9:9.3f} GB  x{count_op[op]}')
    print(f'\n-- top {args.top} single instructions --')
    instrs.sort(reverse=True)
    for nb, label, line in instrs[:args.top]:
        print(f'{nb / 1e6:10.1f} MB  {label:16s} {line}')


if __name__ == '__main__':
    main()
