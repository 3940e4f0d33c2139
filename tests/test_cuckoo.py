"""Cuckoo-filter properties (the deletable Bloom alternative, north_star
"Bloom/cuckoo"): no false negatives, usable fpp, deletion really removes,
partitioned driver state round-trips, serialization stable.
Pure numpy — no Spark session needed."""

from __future__ import annotations

import numpy as np
import pytest

from crawler_spark.operators.cuckoo import CuckooFilter, SeenCuckoo


def _keys(n, seed):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 2**63 - 1, size=n).astype(np.uint64)


def test_no_false_negatives():
    f = CuckooFilter(20_000)
    keys = _keys(18_000, 1)
    f.insert(keys)
    assert f.contains(keys).all()


def test_false_positive_rate_is_small():
    f = CuckooFilter(20_000)
    f.insert(_keys(18_000, 2))
    probe = _keys(50_000, 3)
    fpp = f.contains(probe).mean()
    assert fpp < 0.01, f"fpp {fpp} too high for 16-bit fingerprints"


def test_delete_removes_and_preserves_others():
    f = CuckooFilter(8_000)
    keep = _keys(3_000, 4)
    drop = _keys(3_000, 5)
    f.insert(keep)
    f.insert(drop)
    assert f.delete(drop).all()
    assert f.contains(keep).all()          # deletion never harms other keys
    assert f.contains(drop).mean() < 0.02  # residual = fp collisions only


def test_full_filter_raises():
    f = CuckooFilter(64)                   # tiny: 64-bucket floor, 256 slots
    with pytest.raises(RuntimeError, match="full"):
        f.insert(_keys(5_000, 6))


def test_serialization_roundtrip():
    f = CuckooFilter(10_000)
    keys = _keys(9_000, 7)
    f.insert(keys)
    g = CuckooFilter.from_bytes(f.to_bytes(), f.n_buckets)
    assert g.contains(keys).all()
    assert g.n_items == (f.table != 0).sum()


def test_partitioned_seen_state():
    s = SeenCuckoo(n_parts=8, keys_per_part=10_000)
    a = _keys(20_000, 8).astype(np.int64)
    b = _keys(5_000, 9).astype(np.int64)
    s.insert_keys(a)
    assert s.contains_keys(a).all()
    assert s.contains_keys(b).mean() < 0.01
    half = a[:10_000]
    assert s.delete_keys(half).all()
    assert s.contains_keys(a[10_000:]).all()
    assert s.contains_keys(half).mean() < 0.02
