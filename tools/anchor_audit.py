"""Anchor audit: compare a bench record against the committed per-query
anchors, annotating ambient-load context.

Usage::

    python tools/anchor_audit.py [BENCH_FILE] [--threshold 2.0]

``BENCH_FILE`` defaults to ``BENCH_SELF.json``. Anchors live in
``tools/anchors.json`` (full-name seconds, seeded from the round-12
closing run and overwritten per query by isolated
``SPARK_GRAFT_BENCH_RUNS=7`` medians — the playbook's anchor currency).

Interpretation gate (BASELINE.md "Bench protocol"): identical code has
read 139→213 s total under morning VM load, a documented 1.4–1.6×
ambient drift. A breach row is therefore only a REGRESSION signal when
the run's recorded loadavg was low (≲6 on the 32-cpu VM) or when the
row re-measures hot in ISOLATION; rows breaching only inside a
high-load full-suite pass are annotated ``load-suspect`` and owe an
isolated median-of-7 re-measure, not a code hunt.
"""

from __future__ import annotations

import json
import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
LOAD_SUSPECT_1MIN = 6.0


def main() -> int:
    argv, args, thr = sys.argv[1:], [], 2.0
    i = 0
    while i < len(argv):
        a = argv[i]
        if a.startswith("--threshold"):
            if "=" in a:
                thr = float(a.split("=", 1)[1])
            else:
                thr = float(argv[i + 1])
                i += 1  # consume the value so it can't become BENCH_FILE
        else:
            args.append(a)
        i += 1
    bench_path = args[0] if args else os.path.join(HERE, "..", "BENCH_SELF.json")
    with open(bench_path) as f:
        bench = json.load(f)
    with open(os.path.join(HERE, "anchors.json")) as f:
        anchors = json.load(f)["anchors"]

    loads = bench.get("loadavg_start") or []
    load_note = "no loadavg recorded (pre-r13 record)"
    suspect = False
    if loads:
        end = bench.get("loadavg_end") or loads
        # AMBIENT load = the START reading; loadavg_end mostly measures
        # the bench's own local[32] parallelism (a healthy idle-VM run
        # still ends near 8) and must not mark the run suspect. The
        # 5-min start figure catches a just-finished foreign load whose
        # 1-min average already decayed.
        ambient = max(loads[0], loads[1] if len(loads) > 1 else 0.0)
        suspect = ambient > LOAD_SUSPECT_1MIN
        load_note = (
            f"ambient loadavg at start 1m={loads[0]} 5m={loads[1] if len(loads)>1 else '?'} "
            f"(end={end[0]}, self-load) -> "
            + ("LOAD-SUSPECT run (>%.0f): breaches below need isolated "
               "re-measure before being treated as regressions" % LOAD_SUSPECT_1MIN
               if suspect else "low-ambient run: breaches are real signals")
        )
    print(f"# {load_note}")

    queries = bench.get("queries", {})
    # driver BENCH_r*.json files carry short keys; map them back
    short_anchor = {k.split("_", 1)[0]: v for k, v in anchors.items()}
    rows = []
    for name, secs in queries.items():
        base = anchors.get(name) or short_anchor.get(name.split("_", 1)[0])
        if base is None:
            rows.append((float("inf"), name, secs, None))
            continue
        ratio = secs / base if base > 0 else float("inf")
        if ratio > thr:
            rows.append((ratio, name, secs, base))
    rows.sort(reverse=True)
    if not rows:
        print(f"OK: 0 rows above {thr}x of a committed anchor "
              f"({len(queries)} queries checked)")
        return 0
    missing = 0
    for ratio, name, secs, base in rows:
        if base is None:
            missing += 1
            print(f"NO-ANCHOR {name}: {secs}s (commit an anchor)")
        else:
            tag = "load-suspect" if suspect else "BREACH"
            print(f"{tag} {name}: {secs}s vs anchor {base}s = {ratio:.2f}x")
    print(f"{len(rows)} rows above {thr}x "
          f"({'annotated load-suspect, not regressions' if suspect else 'treat as regressions'})")
    # A real perf breach at low ambient load is the MORE severe signal
    # and must win the exit code; a missing anchor is a bookkeeping
    # error that fails even on a load-suspect run (distinct code 2 so
    # callers can tell it from a perf breach).
    if not suspect and len(rows) > missing:
        return 1
    if missing:
        return 2
    return 0


if __name__ == "__main__":
    sys.exit(main())
