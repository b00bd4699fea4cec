#!/usr/bin/env python3
"""Dump `.explain("formatted")` for benched queries into plans/<tag>/.

Usage: PYTHONPATH=. python scripts/dump_plans_r12.py <suffix> [query ...]
Writes plans/r12/<query>_<suffix>.txt (suffix: before/after).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from datafusion_bio_functions_spark.session import get_or_create_session

import __spark_entry__ as entrymod
from bench import BENCH_QUERIES

def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:] or BENCH_QUERIES
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    outdir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r12")
    os.makedirs(outdir, exist_ok=True)
    spark = get_or_create_session(app_name="plan-dump")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    for name in names:
        if name not in qs:
            print("skip", name)
            continue
        df = qs[name](spark, sf_dir)
        txt = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(txt)
        print("wrote", name)

if __name__ == "__main__":
    main()
