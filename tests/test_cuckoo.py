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


def test_distributed_delete_equals_collected(spark):
    """The scale path (delete_keys_distributed: per-part cogrouped job, no
    key collect) must leave the filter in EXACTLY the state the collected
    path does — asserted byte-for-byte per part on a SKEWED due-set (83% of
    the keys land in one pmod partition), plus the semantic contract
    (deleted gone, retained present, counts equal)."""
    n_parts = 8
    base = _keys(24_000, 10).astype(np.int64)
    # skew: force most keys into part 3 by aligning the low bits
    skewed = ((base >> 3) << 3) | 3
    mixed = np.concatenate([skewed[:20_000], base[20_000:]])
    mixed = np.unique(mixed)

    a = SeenCuckoo(n_parts=n_parts, keys_per_part=24_000)
    b = SeenCuckoo(n_parts=n_parts, keys_per_part=24_000)
    a.insert_keys(mixed)
    b.insert_keys(mixed)

    drop = mixed[::2]                       # half the keys, still skewed
    keys_df = spark.createDataFrame([(int(k),) for k in drop],
                                    "url_hash long").repartition(8)

    n_dist = a.delete_keys_distributed(keys_df)
    n_coll = int(b.delete_keys(drop).sum())
    assert n_dist == n_coll == len(drop)

    assert set(a.parts) == set(b.parts)
    for p in a.parts:
        assert a.parts[p].to_bytes() == b.parts[p].to_bytes(), f"part {p}"

    keep = mixed[1::2]
    assert a.contains_keys(keep).all()
    assert a.contains_keys(drop).mean() < 0.02


def test_distributed_delete_empty_and_absent_parts(spark):
    """Keys routed to parts that never had an insert delete nothing and
    leave the filter untouched."""
    s = SeenCuckoo(n_parts=4, keys_per_part=1 << 10)
    ins = (np.arange(1, 101, dtype=np.uint64) * np.uint64(8)).astype(np.int64)
    s.insert_keys(ins)                      # all keys in part 0
    before = {p: f.to_bytes() for p, f in s.parts.items()}
    probe = spark.createDataFrame([(int(7),), (int(11),), (int(15),)],
                                  "url_hash long")   # parts 3,3,3: absent
    assert s.delete_keys_distributed(probe) == 0
    assert {p: f.to_bytes() for p, f in s.parts.items()} == before
    empty = spark.createDataFrame([], "url_hash long")
    assert s.delete_keys_distributed(empty) == 0
