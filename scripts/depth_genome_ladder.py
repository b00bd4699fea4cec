#!/usr/bin/env python3
"""Genome-shaped depth ladder: breakpoints ∝ data.

The gate's alignments view folds every SF into the same 100 kb coordinate
space, so breakpoint cardinality saturates at ~400 K and growing SF only
raises per-breakpoint event density — the regime where a single-process
columnar engine wins on constants (BASELINE.md round-5 re-class).  This
script measures the OTHER regime, the one real genomes are in: the
coordinate span scales with the row count (constant ~2-3× coverage
density), so the breakpoint count — and the output — grows linearly with
the data.  Per SF it times Spark ``depth(algorithm='auto')`` (noop sink,
best-of-N) against the DuckDB event-sweep oracle on the identical derived
alignments and prints one JSON line per SF.

Usage:
    python scripts/depth_genome_ladder.py /root/testdata/sf0.1 /tmp/testdata_sf1 [...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from datafusion_bio_functions_spark.operators.pileup import depth
from datafusion_bio_functions_spark.session import get_or_create_session

RUNS = 3


def _span_for(con: duckdb.DuckDBPyConnection, path: str) -> int:
    n = con.execute(f"SELECT count(*) FROM read_parquet('{path}')").fetchone()[0]
    # mean read length ~49, 4 contigs → span 60*n/4 keeps density ~3.3×
    return max(60 * n // 4, 1000)


def _spark_depth(spark, path: str, span: int):
    from pyspark.sql import functions as F

    o = spark.read.parquet(path)
    ps = (F.col("o_orderkey") * 37) % span + 1
    aln = o.select(
        F.concat(F.lit("chr"), (F.col("o_orderkey") % 4 + 1).cast("string")).alias("chrom"),
        ps.cast("long").alias("start"),
        F.when(F.col("o_orderkey") % 50 == 0, 1024).otherwise(0).alias("flags"),
        F.concat((F.col("o_orderkey") % 97 + 1).cast("string"), F.lit("M")).alias("cigar"),
        (60 - F.col("o_orderkey") % 30).cast("int").alias("mapping_quality"),
    )
    return depth(aln, min_mapq=20)


ORACLE = """
WITH aln AS (
  SELECT concat('chr', CAST(o_orderkey % 4 + 1 AS VARCHAR)) AS contig,
         CAST((o_orderkey * 37) % {span} + 1 AS BIGINT) AS start,
         CAST((o_orderkey % 97) + 1 AS BIGINT) AS ref_len
  FROM read_parquet('{path}')
  WHERE o_orderkey % 50 <> 0 AND 60 - (o_orderkey % 30) >= 20
), ev AS (
  SELECT contig, start AS pos, 1 AS delta FROM aln
  UNION ALL
  SELECT contig, start + ref_len AS pos, -1 AS delta FROM aln
), agg AS (
  SELECT contig, pos, sum(delta) AS delta FROM ev GROUP BY contig, pos
  HAVING sum(delta) <> 0
), cum AS (
  SELECT contig, pos,
         CAST(sum(delta) OVER (PARTITION BY contig ORDER BY pos
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS coverage,
         lead(pos) OVER (PARTITION BY contig ORDER BY pos) AS next_pos
  FROM cum_src
)
SELECT count(*) FROM (
  SELECT contig, pos, coverage, next_pos FROM cum
  WHERE coverage > 0 AND next_pos IS NOT NULL
)
"""


def main() -> None:
    spark = get_or_create_session(app_name="depth-genome-ladder")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for sf_dir in sys.argv[1:]:
        path = f"{sf_dir.rstrip('/')}/orders.parquet"
        span = _span_for(con, path)

        spark_times = []
        n_blocks = None
        for _ in range(RUNS):
            t0 = time.perf_counter()
            df = _spark_depth(spark, path, span)
            df.write.mode("overwrite").format("noop").save()
            spark_times.append(time.perf_counter() - t0)
        n_blocks = _spark_depth(spark, path, span).count()

        sql = ORACLE.replace("cum_src", "agg").format(span=span, path=path)
        duck_times = []
        oracle_blocks = None
        for _ in range(RUNS):
            t0 = time.perf_counter()
            oracle_blocks = con.execute(sql).fetchone()[0]
            duck_times.append(time.perf_counter() - t0)

        spark_s = min(spark_times)
        duck_s = min(duck_times)
        print(json.dumps({
            "sf_dir": sf_dir,
            "span": span,
            "blocks_spark": n_blocks,
            "blocks_oracle": oracle_blocks,
            "blocks_match": n_blocks == oracle_blocks,
            "spark_s": round(spark_s, 3),
            "duckdb_s": round(duck_s, 3),
            "ratio": round(spark_s / duck_s, 2) if duck_s > 0 else None,
        }))


if __name__ == "__main__":
    main()
