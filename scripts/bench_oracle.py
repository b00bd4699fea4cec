#!/usr/bin/env python3
"""Time the DuckDB oracle formulations of the headline queries on the same
parquet (the BASELINE.md local protocol).  Each query runs in a fresh
subprocess with a hard timeout so quadratic-NLJ oracles report DNF instead
of hanging the run.  Usage:

    python scripts/bench_oracle.py [sf_dir] [timeout_sec] [query ...]
"""

from __future__ import annotations

import json
import multiprocessing as mp
import sys
import time

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _run_one(sf_dir: str, sql: str, q: "mp.Queue") -> None:
    import duckdb

    con = duckdb.connect()
    con.execute("SET threads=32")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    t0 = time.perf_counter()
    con.execute(f"CREATE TABLE _sink AS {sql}")
    q.put(round(time.perf_counter() - t0, 3))


def main() -> None:
    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as em

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/testdata_sf1"
    timeout = float(sys.argv[2]) if len(sys.argv) > 2 else 120.0
    oracles = em.oracle_sql()
    names = sys.argv[3:] or list(oracles)
    out: dict[str, object] = {}
    for name in names:
        if name not in oracles:
            continue
        q: mp.Queue = mp.Queue()
        p = mp.Process(target=_run_one, args=(sf_dir, oracles[name], q))
        p.start()
        p.join(timeout)
        if p.is_alive():
            p.terminate()
            p.join()
            out[name] = f"DNF>{int(timeout)}s"
        else:
            out[name] = q.get() if not q.empty() else "ERR"
        print(name, out[name], flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
