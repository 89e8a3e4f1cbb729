"""Local replica of the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry on Spark and its
``oracle_sql()`` twin on DuckDB at the same scale factor, then compares
row count, column names and (order-insensitively) values — approximating the
driver's value-hash. Usage::

    python tools/check_oracle.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import os
import sys
import traceback

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from lakehouse_engine_spark.core.exec_env import ExecEnv  # noqa: E402
from lakehouse_engine_spark.utils.tables import TABLES  # noqa: E402


def dtype_family(dtype) -> str:
    s = str(dtype)
    if s.startswith("datetime64"):
        return "datetime"
    if s.startswith(("float", "Float")):
        return "float"
    if s.startswith(("int", "Int", "uint")):
        return "int"
    if s == "bool":
        return "bool"
    return "object"


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == object:
            df[c] = df[c].map(lambda v: str(v) if v is not None else None)
        elif str(df[c].dtype).startswith(("float", "Float")):
            df[c] = df[c].astype("float64")
        elif str(df[c].dtype).startswith(("int", "Int", "uint")):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = ExecEnv.get_or_create()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )
    queries, oracles = entrymod.queries(), entrymod.oracle_sql()
    failures = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf).toPandas()
        except Exception:
            failures.append(name)
            print(f"✗ {name}: SPARK ERROR\n{traceback.format_exc()}")
            continue
        if name not in oracles:
            print(f"~ {name}: no oracle (rows-only) → {len(sdf)} rows")
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception:
            failures.append(name)
            print(f"✗ {name}: ORACLE ERROR\n{traceback.format_exc()}")
            continue
        if sorted(sdf.columns) != sorted(odf.columns):
            failures.append(name)
            print(f"✗ {name}: columns {sorted(sdf.columns)} vs {sorted(odf.columns)}")
            continue
        if len(sdf) != len(odf):
            failures.append(name)
            print(f"✗ {name}: rows {len(sdf)} vs {len(odf)}")
            continue
        # The driver's value hash is dtype-sensitive (e.g. DuckDB HUGEINT →
        # float64 vs Spark int64 hashes differently even when values match),
        # so a dtype-family mismatch is a failure here too.
        fam_mismatch = {
            c: (dtype_family(sdf[c].dtype), dtype_family(odf[c].dtype))
            for c in sdf.columns
            if dtype_family(sdf[c].dtype) != dtype_family(odf[c].dtype)
        }
        if fam_mismatch:
            failures.append(name)
            print(f"✗ {name}: dtype families differ — {fam_mismatch}")
            continue
        a, b = normalize(sdf.copy()), normalize(odf.copy())
        try:
            pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=True)
            print(f"✓ {name}: {len(sdf)} rows")
        except AssertionError as e:
            failures.append(name)
            print(f"✗ {name}: VALUES differ — {str(e).splitlines()[-1]}")
            diff_cols = [
                c for c in a.columns if not a[c].equals(b[c])
            ]
            print(f"   differing columns: {diff_cols}")
            for c in diff_cols[:2]:
                mask = ~(a[c].eq(b[c]) | (a[c].isna() & b[c].isna()))
                print(f"   {c}: spark={a.loc[mask, c].head(3).tolist()} oracle={b.loc[mask, c].head(3).tolist()}")
    print(f"\n{'FAILURES: ' + ', '.join(failures) if failures else 'ALL MATCH'}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
