"""Deterministic sampling / domain mixing for training-data pipelines.

Training mixtures specify per-domain sampling rates ("wiki ×2.5, web ×0.3").
Random sampling is irreproducible across runs and engines; these operators
derive a uniform value from ``md5(id # seed)`` instead — the same rows are
kept on every run, on every engine (md5 is bit-identical in Spark and the
DuckDB oracle), and sampling composes with retries/backfills safely.

All pure JVM expressions — no shuffle, no UDF; the filter pushes down to
the scan like any other predicate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: 16 hex digits → 64-bit space; fractions resolve to ~1e-19 granularity
_SPACE = float(1 << 64)


def hash_uniform(key: Column | str, seed: int = 0) -> Column:
    """Deterministic uniform [0, 1) value per key: the first 16 hex digits
    of ``md5(key || '#' || seed)`` scaled into [0, 1)."""
    c = F.col(key) if isinstance(key, str) else key
    hx = F.md5(F.concat_ws("#", c.cast("string"), F.lit(str(seed))))
    return F.conv(F.substring(hx, 1, 16), 16, 10).cast("double") / F.lit(_SPACE)


def hash_sample(
    df: DataFrame, fraction: float, key_col: str = "doc_id", seed: int = 0
) -> DataFrame:
    """Keep a deterministic ``fraction`` of rows by key hash."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    return df.filter(hash_uniform(key_col, seed) < F.lit(float(fraction)))


def mix_domains(
    df: DataFrame,
    weights: dict[str, float],
    domain_col: str = "domain",
    key_col: str = "doc_id",
    seed: int = 0,
    default: float = 0.0,
) -> DataFrame:
    """Per-domain deterministic downsampling: keep each row with its
    domain's fraction from ``weights`` (domains not listed keep
    ``default``).  Upsampling (weights > 1) is out of scope — repeat-epoch
    logic belongs to the dataloader."""
    for d, w in weights.items():
        if not 0.0 <= w <= 1.0:
            raise ValueError(f"weight for {d!r} must be in [0, 1], got {w}")
    if not 0.0 <= default <= 1.0:
        raise ValueError(f"default must be in [0, 1], got {default}")
    frac = F.lit(float(default))
    for d, w in weights.items():
        frac = F.when(F.col(domain_col) == d, F.lit(float(w))).otherwise(frac)
    return df.filter(hash_uniform(key_col, seed) < frac)


def hash_split(
    df: DataFrame,
    fractions: dict[str, float],
    key_col: str = "doc_id",
    seed: int = 0,
    split_col: str = "split",
) -> DataFrame:
    """Deterministic train/validation/test assignment: each row gets the
    label whose cumulative-fraction interval its ``hash_uniform`` value
    lands in — disjoint, exhaustive (fractions must sum to 1 within 1e-9),
    reproducible across runs/engines, and STABLE under corpus growth: a
    row's label depends only on (key, seed), so appending new documents
    never reassigns existing ones (the property that keeps eval sets
    uncontaminated across dataset versions).

    One JVM expression per row — no shuffle; filters on the label column
    push down like any predicate.  Insertion order of ``fractions`` fixes
    the interval layout, so the same dict always yields the same split.
    """
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {total}")
    for name, w in fractions.items():
        if w < 0.0:
            raise ValueError(f"fraction for {name!r} must be >= 0, got {w}")
    u = hash_uniform(key_col, seed)
    label = None
    hi = 0.0
    names = list(fractions)
    for name in names[:-1]:
        # round each cumulative boundary: float accumulation would lower
        # 0.8+0.1 to the literal 0.9000000000000001, disagreeing with the
        # nominal fractions (and any oracle's exact decimal literals) for
        # u values inside the error gap
        hi = round(hi + fractions[name], 12)
        cond = u < F.lit(hi)
        label = F.when(cond, F.lit(name)) if label is None else label.when(cond, F.lit(name))
    last = F.lit(names[-1])
    label = last if label is None else label.otherwise(last)
    return df.withColumn(split_col, label)
