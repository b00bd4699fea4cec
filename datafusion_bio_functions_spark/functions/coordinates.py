"""Coordinate-system normalization between 0-based half-open and 1-based
closed tables — port of the reference's ``CoordinateNormalizer``
(``datafusion/bio-function-vep/src/coordinate.rs:1-74``).

The reference carries the flag as Arrow *schema* metadata under
``bio.coordinate_system_zero_based`` and derives the interval ``FilterOp``
from a mismatch between the two join sides (``coordinate.rs:49-59``).
Spark has no schema-level metadata that survives transformations, so the
flag rides as column metadata on the ``start`` field (``withMetadata``),
with explicit operator parameters always taking precedence (SURVEY §1.5:
prefer parameters, keep metadata as a hint).  Missing metadata defaults to
1-based, exactly as ``is_zero_based`` does (``coordinate.rs:68-74``).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Arrow schema-metadata key used by the reference (coordinate.rs:18).
COORDINATE_SYSTEM_METADATA_KEY = "bio.coordinate_system_zero_based"


def is_zero_based(df: DataFrame, pos_col: str = "start") -> bool:
    """Read the coordinate-system flag from *pos_col*'s field metadata;
    absent metadata means 1-based (coordinate.rs:68-74)."""
    for field in df.schema.fields:
        if field.name == pos_col:
            return str(field.metadata.get(COORDINATE_SYSTEM_METADATA_KEY, "false")) in (
                "true",
                "True",
            )
    return False


def with_coordinate_system(
    df: DataFrame, zero_based: bool, pos_col: str = "start"
) -> DataFrame:
    """Stamp the coordinate-system flag onto *pos_col* (the writer-side
    counterpart of :func:`is_zero_based`)."""
    if pos_col not in df.columns:
        raise ValueError(f"column {pos_col!r} not found in {df.columns}")
    meta = dict(next(f for f in df.schema.fields if f.name == pos_col).metadata)
    meta[COORDINATE_SYSTEM_METADATA_KEY] = "true" if zero_based else "false"
    return df.withColumn(pos_col, F.col(pos_col).alias(pos_col, metadata=meta))


@dataclass(frozen=True)
class CoordinateNormalizer:
    """Pairwise coordinate-system decision (coordinate.rs:25-66)."""

    input_zero_based: bool
    cache_zero_based: bool

    @classmethod
    def from_frames(
        cls,
        input_df: DataFrame,
        cache_df: DataFrame,
        input_pos_col: str = "start",
        cache_pos_col: str = "start",
    ) -> "CoordinateNormalizer":
        return cls(
            input_zero_based=is_zero_based(input_df, input_pos_col),
            cache_zero_based=is_zero_based(cache_df, cache_pos_col),
        )

    def same_system(self) -> bool:
        return self.input_zero_based == self.cache_zero_based

    def filter_op(self) -> str:
        """``weak`` when both sides share a coordinate system, ``strict``
        when they differ (the boundary-shrink encoding,
        coordinate.rs:49-59)."""
        return "weak" if self.same_system() else "strict"
