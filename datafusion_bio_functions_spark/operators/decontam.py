"""Benchmark decontamination for training-data pipelines.

Evaluation integrity requires dropping training documents that share long
word n-grams with benchmark/eval text (the standard "13-gram overlap"
rule).  ``decontaminate`` flags every document sharing at least one word
``n``-gram with any benchmark document:

* both sides explode into word n-grams over single-space tokens,
* grams join on their md5-derived 64-bit key (bit-identical in Spark and
  the DuckDB oracle; at 100 TB the join carries 16-char keys + ids, never
  the gram strings),
* a LEFT SEMI join marks contaminated ids — document payloads never
  shuffle, and the benchmark side (small by nature) broadcasts.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _gram_keys(text: Column, n: int) -> Column:
    """md5-prefix keys of the word n-grams of ``text`` (single-space
    tokens); empty array when the text has fewer than ``n`` tokens."""
    toks = F.split(text, " ")
    cnt = F.size(toks)
    idx = F.sequence(F.lit(1), cnt - (n - 1))
    grams = F.transform(idx, lambda i: F.substring(
        F.md5(F.concat_ws(" ", F.slice(toks, i, n))), 1, 16
    ))
    return F.when(cnt >= n, grams).otherwise(F.array().cast("array<string>"))


def decontaminate(
    docs: DataFrame,
    benchmarks: DataFrame,
    n: int = 13,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str = "text",
    output: str = "flag",
) -> DataFrame:
    """Flag training documents sharing any word ``n``-gram with benchmark
    text.  ``output='flag'`` returns all ``docs`` columns +
    ``is_contaminated``; ``output='clean'`` returns only uncontaminated
    rows (the pipeline's keep set)."""
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    if output not in ("flag", "clean"):
        raise ValueError(f"output must be 'flag' or 'clean', got {output!r}")
    bench_grams = (
        benchmarks.select(F.explode(_gram_keys(F.col(bench_text_col), n)).alias("__g"))
        .distinct()
    )
    doc_grams = docs.select(
        F.col(id_col).alias("__id"), F.explode(_gram_keys(F.col(text_col), n)).alias("__g")
    )
    hit_ids = (
        doc_grams.join(F.broadcast(bench_grams), "__g", "left_semi")
        .select("__id")
        .distinct()
        .withColumn("__hit", F.lit(True))
    )
    flagged = docs.join(
        hit_ids.withColumnRenamed("__id", id_col), id_col, "left"
    ).withColumn("is_contaminated", F.coalesce(F.col("__hit"), F.lit(False))).drop("__hit")
    if output == "clean":
        return flagged.filter(~F.col("is_contaminated")).drop("is_contaminated")
    return flagged
