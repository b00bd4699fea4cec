"""Sequence packing for training-data pipelines.

Pretraining dataloaders consume fixed-token-budget *packs* of documents;
assigning documents to packs is the last shuffle-heavy step of a data
pipeline.  ``pack_documents`` implements the standard shard-parallel
next-fit strategy: documents are hash-sharded, each shard packs its
documents in deterministic id order with a sequential next-fit fold, and
shards pack independently in parallel — the realistic 100 TB design, where
packing quality is traded for parallelism only across shards (a shard's
pack stream is exactly the single-machine next-fit result).

The fold is sequential per shard by construction (pack state carries
across rows), so the shard interior runs inside one ``applyInPandas``
group; the gate verifies it against a DuckDB recursive-CTE fold.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import token_count


def pack_documents(
    df: DataFrame,
    budget: int,
    id_col: str = "doc_id",
    token_col: str | None = None,
    text_col: str = "text",
    n_shards: int = 32,
) -> DataFrame:
    """Assign each document to a ``(shard, pack_id)`` with next-fit packing.

    * ``budget``: max tokens per pack.  A document exceeding the budget
      gets a pack of its own (packs never split documents).
    * ``token_col``: precomputed token counts; default derives
      ``token_count(text_col)`` (single-space tokens).
    * ``n_shards``: parallelism — documents shard by ``id % n_shards`` and
      pack independently per shard in ascending id order (deterministic).
      At scale pick ``n_shards ∝ cluster cores``; each shard's documents
      must fit one task (they stream through a single Arrow group).

    Output: ``(id_col, shard, pack_id, n_tokens)`` — ``pack_id`` is dense
    per shard starting at 0.
    """
    import pandas as pd

    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    if n_shards <= 0:
        raise ValueError(f"n_shards must be positive, got {n_shards}")

    tokens = (
        F.col(token_col).cast("long") if token_col is not None
        else token_count(text_col)
    )
    base = df.select(
        F.col(id_col).cast("long").alias("doc_id"),
        tokens.alias("n_tokens"),
    ).withColumn("shard", F.pmod(F.col("doc_id"), F.lit(n_shards)).cast("long"))

    schema = "doc_id long, shard long, pack_id long, n_tokens long"

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        packs = []
        acc = 0
        pid = -1
        for t in pdf["n_tokens"]:
            t = int(t)
            if pid < 0 or acc + t > budget:
                pid += 1
                acc = t
            else:
                acc += t
            packs.append(pid)
        pdf["pack_id"] = packs
        return pdf[["doc_id", "shard", "pack_id", "n_tokens"]]

    out = base.groupBy("shard").applyInPandas(_pack, schema)
    if id_col != "doc_id":
        out = out.withColumnRenamed("doc_id", id_col)
    return out
