"""Guards on the driver-contract registry (__spark_entry__): the
correctness gate checks the FIRST 50 entries each round, so ordering and
queries()/oracle_sql() consistency are load-bearing."""

from __future__ import annotations

import __spark_entry__ as entry


def test_registry_consistency():
    q = entry.queries()
    o = entry.oracle_sql()
    assert len(q) >= 124
    assert all(callable(v) for v in q.values()), "queries() must map to callables"
    # every oracle key corresponds to a registered query
    unknown = [k for k in o if k not in q]
    assert unknown == [], f"orphan oracle entries: {unknown}"
    # the only intentionally oracle-less query is the iterative BPE trainer
    missing = [k for k in q if k not in o]
    assert missing == ["dp69_bpe_tokenize"], missing
    # no duplicate short keys — bench.py's compact driver line depends on it
    shorts = [k.split("_", 1)[0] for k in q]
    assert len(set(shorts)) == len(shorts)


def test_driver_window_holds_rotation_cohort():
    """Round-5 policy: the 50-entry driver window front-loads the queries
    that never received the driver's hard signal (new GAB arms, dp29, the
    judge-verified-only dp30..dp73 cohort). A reorder that silently
    rotates dp29 or the new arms back out would waste the round's hard
    signal — pin the boundary."""
    names = list(entry.queries())
    window = set(names[:50])
    assert {"q26_gab_daily_rollup", "q27_gab_year_month_snapshot",
            "q28_gab_weekly_sunday_rollup", "dp29_pack_sequences"} <= window
    assert "dp30_asof_forward_tolerance" in window
    assert "dp73_weighted_sample_k" in window
    assert "dp74_lexical_diversity" not in window  # first of the leftovers
