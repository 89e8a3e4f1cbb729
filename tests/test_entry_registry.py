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
    """Round-7 policy: the 50-entry driver window front-loads the 7
    queries whose code or oracle changed this round (the rewritten
    kmeans assignment dp112/dp113, reshaped dp110, corrected dp106
    oracle, touched dp100/dp97) plus the new q30, then the COMPLETE
    r04 cohort —
    the 43 queries whose last hard driver signal is the oldest on the
    board. A reorder that silently rotates the cohort back out would
    waste the round's hard signal — pin the boundary."""
    import json
    import pathlib

    names = list(entry.queries())
    window = set(names[:50])
    changed = {"dp110_random_projection", "dp112_embedding_kmeans",
               "dp113_cluster_stats", "dp106_temperature_sample",
               "dp100_unimax_sample", "dp97_semantic_dedup",
               "q30_gab_week_day_snapshot"}
    assert changed <= window, sorted(changed - window)
    last = {}
    for r in range(1, 7):
        p = pathlib.Path(__file__).parent.parent / f"CORRECTNESS_r0{r}.json"
        if p.exists():
            for k in json.loads(p.read_text()):
                last[k] = r
    r04 = {k for k in names if last.get(k) == 4}
    assert r04 <= window, sorted(r04 - window)
    assert len(window) == 50
