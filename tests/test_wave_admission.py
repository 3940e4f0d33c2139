"""w4/mm4 registry-query invariants (the cross-engine value equality itself
is the driver gate / tools/verify_contract.py; these pin the SEMANTIC
properties the oracle construction relies on)."""

from __future__ import annotations

from collections import Counter

SF = "/root/testdata/sf0.001"


def test_w4_budget_binds_and_carries_over(spark):
    from crawler_spark.queries import (
        _W4_SEED_MOD, _W4_TOKENS, _W4_WAVES, w4_wave_admission,
    )

    rows = w4_wave_admission(spark, SF).collect()
    # politeness budget: never more than the per-host token grant per wave
    per = Counter((r["wave"], r["host"]) for r in rows)
    assert max(per.values()) <= _W4_TOKENS
    # a URL is admitted at most once across all waves (seen-set contract)
    ids = [r["doc_id"] for r in rows]
    assert len(ids) == len(set(ids))
    assert {r["wave"] for r in rows} == set(range(1, _W4_WAVES + 1))
    # leftover carry-over: the seed hosts (doc_id%10 -> src0/src10 under
    # source = src{doc_id%20}) hold more seeds than one wave's budget, so
    # they must appear in wave 2 again with another full batch
    assert per[(1, "src0")] == _W4_TOKENS and per[(2, "src0")] == _W4_TOKENS
    # seeds all come from the two seed hosts in wave 1
    w1_hosts = {r["host"] for r in rows if r["wave"] == 1}
    assert w1_hosts == {"src0", "src10"}
    # determinism: a second run is identical
    again = w4_wave_admission(spark, SF).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_mm4_packing_invariants(spark):
    from crawler_spark.queries import (
        _MM4_BUDGET, _MM4_MEDIA_TOKENS, mm4_multimodal_pack,
    )

    rows = sorted(mm4_multimodal_pack(spark, SF).collect(),
                  key=lambda r: r["doc_id"])
    prev = 0
    for r in rows:
        assert r["n_tokens"] == r["text_tokens"] + r["media_tokens"]
        assert r["media_tokens"] % _MM4_MEDIA_TOKENS == 0
        # prefix sum is exactly the running total in doc_id order
        assert r["prev_tokens"] == prev
        assert r["seq_id"] == prev // _MM4_BUDGET
        assert r["seq_offset"] == prev % _MM4_BUDGET
        prev += r["n_tokens"]
    assert prev > 0
