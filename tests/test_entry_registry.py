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
    # round 10 closed the last no-oracle row (dp69's trainer is replayed
    # via 30 unrolled merge rounds) — every registered query has an oracle
    missing = [k for k in q if k not in o]
    assert missing == [], missing
    # no duplicate short keys — bench.py's compact driver line depends on it
    shorts = [k.split("_", 1)[0] for k in q]
    assert len(set(shorts)) == len(shorts)


def test_driver_window_holds_rotation_cohort():
    """The 50-entry driver window must front-load (a) every query named
    in entry.WINDOW_RETOUCHED — new or code-touched this round — and
    (b) the queries whose last hard driver signal is the STALEST on the
    board. Derived entirely from the registry's own WINDOW_RETOUCHED
    constant plus the CORRECTNESS_r*.json history, so a rotation only
    has to update WINDOW_RETOUCHED — per-round name pins can never go
    stale again (the round-8 lesson). The newest CORRECTNESS file is
    skipped only when its key set is EXACTLY the current first-50: that
    file is the product of this very window (the driver writes it from
    the registry order), not evidence the window should rotate; any
    genuine partial rotation changes the set and the file counts as
    history."""
    import json
    import pathlib
    import re

    names = list(entry.queries())
    window = names[:50]
    wset = set(window)
    assert len(window) == 50 and len(wset) == 50
    retouched = set(entry.WINDOW_RETOUCHED)
    assert retouched <= set(names), sorted(retouched - set(names))
    # (a) retouched queries are inside the window
    assert retouched <= wset, sorted(retouched - wset)

    root = pathlib.Path(__file__).parent.parent
    files = sorted(
        root.glob("CORRECTNESS_r*.json"),
        key=lambda p: int(re.search(r"r(\d+)", p.name).group(1)),
    )
    last: dict = {}
    for p in files:
        rnd = int(re.search(r"(\d+)", p.name).group(1))
        keys = set(json.loads(p.read_text()))
        if p is files[-1] and keys == wset:
            continue  # this file was generated FROM the current window
        for k in keys:
            last[k] = max(last.get(k, 0), rnd)
    if not last:
        return  # round 1: no history yet, nothing to derive
    # new queries (never driver-checked) must be getting their first
    # hard signal now
    never = {k for k in names if k not in last}
    assert never <= wset, sorted(never - wset)
    # (b) staleness priority: nothing OUTSIDE the window may be strictly
    # staler than the freshest non-retouched query INSIDE it
    inside = [last[k] for k in window if k not in retouched and k in last]
    if inside:
        boundary = max(inside)
        stale_out = sorted(
            k for k in names[50:]
            if k not in retouched and last.get(k, boundary) < boundary
        )
        assert stale_out == [], (
            f"queries staler than the window boundary r{boundary:02d} were "
            f"rotated out: {stale_out} — rotate them in (or add them to "
            "WINDOW_RETOUCHED if their code changed)"
        )


def test_every_query_has_a_committed_anchor():
    """tools/anchors.json is the anchor-audit currency: a query without
    an anchor silently escapes the per-round >2x gate, so every
    queries() entry must carry one (new queries get an isolated
    median-of-7 anchor in the same round they land)."""
    import json
    import pathlib

    anchors = json.loads(
        (pathlib.Path(__file__).parent.parent / "tools" / "anchors.json")
        .read_text()
    )["anchors"]
    missing = [k for k in entry.queries() if k not in anchors]
    assert missing == [], missing
