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


# ---------------------------------------------------------------------------
# Genomic chromosome ordering (cache builder / key encoding parity)
# ---------------------------------------------------------------------------

#: Canonical chromosomes in genomic code order — the reference's
#: CHROM_CODE_ORDER / MAIN_CHROMS (cache_builder.rs:52-62).
MAIN_CHROMS: tuple[str, ...] = tuple(
    [str(i) for i in range(1, 23)] + ["X", "Y", "MT"]
)

#: First code for non-canonical contigs (key_encoding.rs:36).
NON_CANONICAL_START = 26


def chrom_code(col: "F.Column | str") -> "F.Column":
    """Genomic chromosome code as a Spark expression — the ordering half of
    the reference's fjall key encoding (``key_encoding.rs:13-36,60-75``):
    the ``chr`` prefix is stripped, autosomes map to 1-22, X=23, Y=24,
    MT=25, and every non-canonical contig maps to the shared
    NON_CANONICAL_START code (26).  Since the ``chr`` strip implies UCSC
    names are supported, the UCSC mitochondrial spelling ``chrM`` (bare
    ``M``) normalizes to the MT code too — without this, chrM-named rows
    sorted as non-canonical while chrMT sorted canonically.  The reference disambiguates
    non-canonical contigs with a registration-order registry whose codes
    are lexicographic for registered contigs
    (``cache_builder.rs:3140-3186``); a relational engine gets the same
    total order by sorting on ``(chrom_code, bare_name)`` — see
    :func:`genomic_sort_keys`."""
    c = F.col(col) if isinstance(col, str) else col
    bare = F.regexp_replace(c, "^chr", "")
    return F.coalesce(
        F.when(bare.rlike("^([1-9]|1[0-9]|2[0-2])$"), bare.cast("int")),
        F.when(bare == "X", F.lit(23))
        .when(bare == "Y", F.lit(24))
        # DELIBERATE superset of the reference key encoding: bare 'M'
        # (UCSC mitochondrial naming without the chr prefix) also maps to
        # the MT code — a genuine non-UCSC contig literally named 'M'
        # would sort canonically here where the reference buckets it
        # NON_CANONICAL.  Pinned by test_chrom_code_truth_table; harmless
        # for real genomes (no assembly names a nuclear contig 'M').
        .when((bare == "MT") | (bare == "M"), F.lit(25)),
        F.lit(NON_CANONICAL_START),
    ).cast("int")


def genomic_sort_keys(col: "F.Column | str") -> list:
    """Sort keys reproducing the reference's cache ordering: canonical
    chromosomes in code order (1..22, X, Y, MT — NOT alphabetical, the
    exact trap ``split_chroms`` guards against, ``cache_builder.rs:2086``),
    then non-canonical contigs lexicographically after them
    (``test_chrom_batches_ordering_main_then_other``)."""
    c = F.col(col) if isinstance(col, str) else col
    return [chrom_code(c), F.regexp_replace(c, "^chr", "")]


def split_chroms(chroms: list[str] | None) -> tuple[list[str], list[str]]:
    """Python mirror of the reference's ``split_chroms``
    (``cache_builder.rs:2080-2108``): partition a contig list into
    (main, other) with main sorted by genomic code and other left in input
    order; ``None`` defaults to the full MAIN_CHROMS list."""
    if chroms is None:
        return list(MAIN_CHROMS), []
    main_set = set(MAIN_CHROMS)
    code = {c: i for i, c in enumerate(MAIN_CHROMS)}
    main = sorted(
        (c for c in chroms if c in main_set), key=lambda c: code[c]
    )
    other = [c for c in chroms if c not in main_set]
    return main, other
