#!/usr/bin/env python3
"""Scale the driver-generated testdata by replicating with key-band offsets
(join keys stay consistent across tables; interval/hash views derive fresh
values per replica because the keys differ).  Usage:

    python scripts/make_sf.py /root/testdata/sf0.1 /tmp/testdata_sf1 10

Dimension tables (region, nation) are copied as-is so TPC-H join shapes are
preserved.  Key offsets are sized so replica bands never collide with the
derived views' id arithmetic (docs_dup adds +1M to doc_id → doc band 100M).
"""

from __future__ import annotations

import os
import sys

import duckdb

#: table → (key column → per-replica offset)
OFFSETS: dict[str, dict[str, int]] = {
    "orders": {"o_orderkey": 10_000_000, "o_custkey": 1_000_000},
    "lineitem": {
        "l_orderkey": 10_000_000,
        "l_partkey": 1_000_000,
        "l_suppkey": 100_000,
    },
    "customer": {"c_custkey": 1_000_000},
    "supplier": {"s_suppkey": 100_000},
    "part": {"p_partkey": 1_000_000},
    "events": {"event_id": 100_000_000, "user_id": 1_000_000},
    "documents": {"doc_id": 100_000_000},
    "embeddings": {"vec_id": 100_000_000},
}
COPY_AS_IS = ["region", "nation"]


def main() -> None:
    src, dst, factor = sys.argv[1], sys.argv[2], int(sys.argv[3])
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    # large factors: stream the replicated COPY instead of materializing —
    # row order is irrelevant to every consumer (Spark re-partitions), and
    # an unbounded buffer at factor=1000 eats >100 GB on lineitem
    con.execute("SET preserve_insertion_order=false")
    con.execute("SET memory_limit='24GB'")
    only = os.environ.get("MAKE_SF_ONLY")
    tables = OFFSETS if not only else {
        t: OFFSETS[t] for t in only.split(",") if t in OFFSETS
    }
    for t in COPY_AS_IS:
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{src}/{t}.parquet')) "
            f"TO '{dst}/{t}.parquet' (FORMAT PARQUET)"
        )
    for t, offs in tables.items():
        repl = ", ".join(
            f"{col} + k.k * {off} AS {col}" for col, off in offs.items()
        )
        con.execute(
            f"COPY (SELECT * REPLACE ({repl}) "
            f"FROM read_parquet('{src}/{t}.parquet') "
            f"CROSS JOIN (SELECT unnest(range({factor})) AS k) k) "
            f"TO '{dst}/{t}.parquet' (FORMAT PARQUET)"
        )
        n = con.execute(f"SELECT count(*) FROM read_parquet('{dst}/{t}.parquet')").fetchone()[0]
        print(f"{t}: {n} rows")


if __name__ == "__main__":
    main()
