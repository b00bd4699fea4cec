"""Structured Streaming variants of the engine's operators.

The reference has NO streaming component (all plans are
``Boundedness::Bounded`` — SURVEY.md §2.5); these are the Spark-native
extensions a continuously-ingesting pipeline needs.  They reuse the exact
batch expression trees, which is the point of declaring operators over
DataFrames: the same logical plan runs bounded or unbounded.

* ``streaming_depth_events``  — CIGAR→coverage-event generation on a stream
  of alignments (stateless; the running-sum/RLE step is a batch `foreachBatch`
  or windowed-aggregation concern downstream).
* ``streaming_event_counts``  — watermarked tumbling-window counts over the
  ``events`` table shape (ts, event_type, value).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.pileup import _cigar_segments_sql


def streaming_depth_events(alignments: DataFrame, zero_based: bool = False) -> DataFrame:
    """Stateless stream stage: alignments → (contig, pos, delta) coverage
    events, ready for a windowed/stateful accumulation downstream."""
    start_1b = "start + 1" if zero_based else "start"
    seg = alignments.withColumn("__segs", F.expr(_cigar_segments_sql(start_1b, "cigar")))
    return (
        seg.select(F.col("chrom").alias("contig"), F.explode("__segs").alias("__seg"))
        .select(
            "contig",
            F.explode(
                F.array(
                    F.struct(F.col("__seg.s").alias("pos"), F.lit(1).alias("delta")),
                    F.struct((F.col("__seg.e") + 1).alias("pos"), F.lit(-1).alias("delta")),
                )
            ).alias("ev"),
        )
        .select("contig", F.col("ev.pos").alias("pos"), F.col("ev.delta").alias("delta"))
    )


def streaming_event_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Watermarked tumbling-window count/sum per event type — late rows
    beyond the watermark are dropped, state is bounded."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("w"), F.col(type_col))
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("value_sum"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col(type_col),
            "n",
            "value_sum",
        )
    )
