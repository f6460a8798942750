"""MFU estimate for the GGA weak-train step.

Lowers the full-size train step once (CPU backend — the HLO and its
FLOP count are identical across backends) and reads XLA's
``cost_analysis()`` FLOPs, then divides by the measured step time from
bench.py to get model FLOPs utilization against the TPU v5e bf16 peak.

A sparse-conv engine is gather-bound, not FLOP-bound, so the expected
MFU is low single digits — the number exists to quantify HOW far the
step is from the MXU roof (the gap is the theoretical headroom of any
denser formulation, cf. the dense-tile and window-conv negative
results in CLAUDE.md).

Usage: python tools/mfu_estimate.py [--step-ms 553] [--b 8]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

V5E_BF16_PEAK = 197e12  # TPU v5e peak bf16 FLOP/s (public spec: 197 TF)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--step-ms', type=float, default=None,
                    help='measured full-step time (default: derive from '
                         'the bench baseline 14.45 scenes/s at --b)')
    ap.add_argument('--b', type=int, default=8)
    ap.add_argument('--cpu', action='store_true', default=True)
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

    lowered = jax.jit(step).lower(state, batch)
    cost = lowered.compile().cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    flops = float(cost.get('flops', 0.0))
    bytes_ = float(cost.get('bytes accessed', 0.0))

    step_s = (args.step_ms / 1e3 if args.step_ms
              else B / 14.45)  # bench baseline, CLAUDE.md round-4
    mfu = flops / step_s / V5E_BF16_PEAK
    hbm = bytes_ / step_s / 819e9  # v5e HBM bw 819 GB/s
    print(f'train step (batch {B}): {flops / 1e9:.1f} GFLOP, '
          f'{bytes_ / 1e9:.2f} GB accessed (XLA cost model)')
    print(f'at {step_s * 1e3:.0f} ms/step: MFU = {mfu * 100:.2f}% of '
          f'v5e bf16 peak; HBM utilization ~= {hbm * 100:.1f}%')


if __name__ == '__main__':
    main()
