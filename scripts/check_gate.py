#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate: run queries() vs
oracle_sql() side-by-side at a given SF and report row/schema/value
matches.  Usage:  python scripts/check_gate.py [query ...]  (default: all
queries that have an oracle).  Env: SPARK_GRAFT_SF_DIR (default sf0.01).
"""

from __future__ import annotations

import os
import sys

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from datafusion_bio_functions_spark.session import get_or_create_session

import __spark_entry__ as entrymod

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    names = sys.argv[1:]

    spark = get_or_create_session(app_name="gate-check")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    targets = names or [n for n in qs if n in oracles]
    failed = []
    for name in targets:
        try:
            sdf = qs[name](spark, sf_dir).toPandas()
            if name not in oracles:
                print(f"{name:28s} rows={len(sdf)} (no oracle)")
                continue
            odf = con.execute(oracles[name]).fetchdf()
            s, o = _canon(sdf), _canon(odf)
            rows_ok = len(s) == len(o)
            schema_ok = list(s.columns) == list(o.columns)
            if rows_ok and schema_ok:
                try:
                    pd.testing.assert_frame_equal(
                        s, o, check_dtype=False, check_exact=False, rtol=1e-9
                    )
                    vals_ok = True
                except AssertionError as e:
                    vals_ok = False
                    print(f"    diff: {str(e).splitlines()[-1][:200]}")
            else:
                vals_ok = False
            status = "PASS" if (rows_ok and schema_ok and vals_ok) else "FAIL"
            print(
                f"{name:28s} {status} rows {len(s)}/{len(o)} "
                f"schema={'ok' if schema_ok else f'{list(s.columns)} vs {list(o.columns)}'}"
            )
            if status == "FAIL":
                failed.append(name)
        except Exception as exc:  # noqa: BLE001
            print(f"{name:28s} ERR  {type(exc).__name__}: {str(exc).splitlines()[0][:180]}")
            failed.append(name)
    if failed:
        print("FAILED:", ", ".join(failed))
        sys.exit(1)
    print("all green")


if __name__ == "__main__":
    main()
