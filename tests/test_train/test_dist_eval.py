"""Sharded-eval collect: interleaved shards round-trip through the
filesystem collect exactly (multi_gpu_test tmpdir semantics,
/root/reference/tools/generate_pseudo_labels_gga.py:242)."""
import pickle

import pytest

from gga_tpu.parallel.dist_eval import (collect_parts, dump_part,
                                        shard_indices)


def test_shard_indices_partition():
    n, world = 23, 4
    all_idx = sorted(sum((shard_indices(n, r, world)
                          for r in range(world)), []))
    assert all_idx == list(range(n))


def test_collect_roundtrip(tmp_path):
    n, world = 23, 4
    data = [{'scene': i, 'boxes': [i * 1.0]} for i in range(n)]
    for r in range(world):
        part = [data[i] for i in shard_indices(n, r, world)]
        dump_part(part, r, str(tmp_path))
    merged = collect_parts(n, world, str(tmp_path), timeout_s=5)
    assert merged == data


def test_collect_size_mismatch_raises(tmp_path):
    dump_part([1, 2, 3], 0, str(tmp_path))
    dump_part([1], 1, str(tmp_path))
    with pytest.raises(ValueError, match='expected'):
        collect_parts(4, 2, str(tmp_path), timeout_s=5)


def test_collect_timeout(tmp_path):
    dump_part([1, 2], 0, str(tmp_path))
    with pytest.raises(TimeoutError):
        collect_parts(4, 2, str(tmp_path), timeout_s=0.2, poll_s=0.05)
