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
    """Round-6 policy: the 50-entry driver window front-loads the 26
    queries that never received the driver's hard signal (the
    post-rotation cohort dp74..dp96 + q25, plus the new dp69b and q29),
    then §2-family representatives and a refresh spread. A reorder that
    silently rotates the cohort back out would waste the round's hard
    signal — pin the boundary."""
    names = list(entry.queries())
    window = set(names[:50])
    cohort = {f"dp{i}_" for i in range(74, 97)}
    in_window_prefixes = {n.split("_")[0] + "_" for n in window}
    assert all(p in in_window_prefixes for p in cohort), (
        sorted(cohort - in_window_prefixes)
    )
    assert {"q25_scalar_subquery_avg", "dp69b_bpe_encode",
            "q29_gab_day_recon_recompute", "dp97_semantic_dedup",
            "dp98_ngram_counts", "dp99_hash_embedding",
            "dp100_unimax_sample", "dp101_reservoir_quantiles",
            "dp102_decontaminate_bloom", "dp103_zorder_layout",
            "dp104_zorder_rank", "dp105_stream_dedup_exact",
            "dp106_temperature_sample", "dp107_profile_skew",
            "dp108_corpus_overlap"} <= window
    # §2 representatives
    assert {"q01_pricing_summary", "q07_dq_stats", "q08_reconciliation",
            "q17_gab_weekly_rollup"} <= window
    # driver-green rows rotated out to make room (incl. dp28/dp29, whose
    # watch items closed with driver-green r05 rows and the standalone
    # re-measure recorded in BASELINE.md)
    assert "q26_gab_daily_rollup" not in window
