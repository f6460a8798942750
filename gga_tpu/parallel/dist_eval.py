"""Distributed (multi-process) evaluation: shard scenes over processes,
collect per-shard results through the filesystem.

Behavioral rebuild of the reference's ``multi_gpu_test`` tmpdir collect
(mmdet apis, consumed at
/root/reference/tools/generate_pseudo_labels_gga.py:242): every rank
processes an interleaved shard (DistributedSampler order: idx %% world ==
rank), dumps ``part_<rank>.pkl``, and rank 0 polls until all parts exist
and merges them back into dataset order. Filesystem collect works both
for jax multi-host processes (shared FS) and plain multi-process
launches; there is no NCCL-style object gather to translate — XLA
collectives move arrays, results here are host-side python objects.
"""
from __future__ import annotations

import os
import pickle
import time


def shard_indices(num_items: int, rank: int, world: int):
    """Interleaved shard (torch DistributedSampler without padding)."""
    return list(range(rank, num_items, world))


def dump_part(results, rank: int, tmpdir: str):
    os.makedirs(tmpdir, exist_ok=True)
    tmp = os.path.join(tmpdir, f'.part_{rank}.pkl.tmp')
    with open(tmp, 'wb') as f:
        pickle.dump(results, f)
    os.replace(tmp, os.path.join(tmpdir, f'part_{rank}.pkl'))


def collect_parts(num_items: int, world: int, tmpdir: str,
                  timeout_s: float = 3600.0, poll_s: float = 1.0):
    """Rank-0 side: wait for every part file, merge to dataset order.

    Each part holds the rank's results in ITS shard order; the merge
    inverts the interleaving. Returns a list of length ``num_items``.
    """
    paths = [os.path.join(tmpdir, f'part_{r}.pkl') for r in range(world)]
    deadline = time.time() + timeout_s
    while not all(os.path.exists(p) for p in paths):
        if time.time() > deadline:
            missing = [p for p in paths if not os.path.exists(p)]
            raise TimeoutError(f'missing eval parts: {missing}')
        time.sleep(poll_s)
    merged = [None] * num_items
    for r, path in enumerate(paths):
        with open(path, 'rb') as f:
            part = pickle.load(f)
        idxs = shard_indices(num_items, r, world)
        if len(part) != len(idxs):
            raise ValueError(
                f'part {r} has {len(part)} results, expected {len(idxs)}')
        for i, res in zip(idxs, part):
            merged[i] = res
    return merged


def run_sharded_inference(model, model_cfg, state, cfg, infos, batch_size,
                          tmpdir, rank=None, world=None, max_points=None):
    """Shard ``infos`` over processes, run tools_lib.run_inference on the
    local shard, collect on rank 0 (returns merged detections there,
    ``None`` elsewhere).

    rank/world default to jax process identity (single process -> 1/1,
    multi-host -> the real topology).
    """
    import jax

    from ..tools_lib import run_inference

    rank = jax.process_index() if rank is None else rank
    world = jax.process_count() if world is None else world
    # clear stale part files so a rerun with the same tmpdir cannot
    # silently merge a previous run's shards (the reference uses a fresh
    # random tmpdir; here the dir is caller-chosen, so rank 0 scrubs it)
    if rank == 0 and os.path.isdir(tmpdir):
        for r in range(world):
            stale = os.path.join(tmpdir, f'part_{r}.pkl')
            if os.path.exists(stale):
                os.remove(stale)
    if world > 1 and jax.process_count() == world:
        # real multi-host launch: barrier so no rank dumps before the
        # scrub (plain multi-process launches rely on rank 0 scrubbing
        # before its own — equally long — inference pass)
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices('gga_dist_eval_scrub')
    local = [infos[i] for i in shard_indices(len(infos), rank, world)]
    part = run_inference(model, model_cfg, state, cfg, local, batch_size,
                         max_points=max_points)
    dump_part(part, rank, tmpdir)
    if rank != 0:
        return None
    return collect_parts(len(infos), world, tmpdir)
