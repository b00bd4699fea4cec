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
    stream_per_shard: bool = False,
) -> DataFrame:
    """Assign each document to a ``(shard, pack_id)`` with next-fit packing.

    * ``budget``: max tokens per pack.  A document exceeding the budget
      gets a pack of its own (packs never split documents).
    * ``token_col``: precomputed token counts; default derives
      ``token_count(text_col)`` (single-space tokens).
    * ``n_shards``: parallelism — documents shard by ``id % n_shards`` and
      pack independently per shard in ascending id order (deterministic).
      At scale pick ``n_shards ∝ cluster cores``.
    * ``stream_per_shard``: the default ``applyInPandas`` form materializes
      each shard as ONE Arrow group, so a shard must fit task memory.
      ``True`` streams instead: rows are hash-partitioned by shard, sorted
      ``(shard, doc_id)`` within partitions, and folded by a ``mapInPandas``
      iterator that carries per-shard ``(acc, pack_id)`` state across Arrow
      batches — identical output, bounded memory at any shard size
      (property-tested with shards spanning many batches).

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
    # a NULL text/token count packs as a zero-length document — the fold
    # kernels would otherwise crash on the NaN it becomes in pandas
    base = df.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.coalesce(tokens, F.lit(0)).alias("n_tokens"),
    ).withColumn("shard", F.pmod(F.col("doc_id"), F.lit(n_shards)).cast("long"))

    schema = "doc_id long, shard long, pack_id long, n_tokens long"

    if stream_per_shard:
        # iterator form: every row of a shard lands in one partition
        # (repartition by shard) and arrives in fold order
        # (sortWithinPartitions) — the fold state dict carries across
        # Arrow batches, so no shard is ever materialized whole
        part = base.repartition(n_shards, "shard").sortWithinPartitions(
            "shard", "doc_id"
        )

        def _pack_stream(batches):
            state: dict[int, tuple[int, int]] = {}  # shard -> (acc, pid)
            for pdf in batches:
                packs = []
                for s, tok in zip(pdf["shard"].tolist(), pdf["n_tokens"].tolist()):
                    s, tok = int(s), int(tok)
                    acc, pid = state.get(s, (0, -1))
                    if pid < 0 or acc + tok > budget:
                        pid += 1
                        acc = tok
                    else:
                        acc += tok
                    state[s] = (acc, pid)
                    packs.append(pid)
                pdf = pdf.copy()
                pdf["pack_id"] = packs
                yield pdf[["doc_id", "shard", "pack_id", "n_tokens"]]

        out = part.mapInPandas(_pack_stream, schema)
        if id_col != "doc_id":
            out = out.withColumnRenamed("doc_id", id_col)
        return out

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
