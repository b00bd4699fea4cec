"""PySpark-native analytics engine with the capabilities of
``biodatageeks/datafusion-bio-functions`` (genomic interval algebra, pileup
depth-of-coverage, VEP-style variant annotation) plus large-scale
training-data pipeline operators (dedup, similarity search, text analysis,
multimodal plumbing).

Spark SQL is the engine: every operator returns a plain DataFrame built from
declarative DataFrame/SQL primitives so Catalyst + AQE plan the physical
execution; Python/pandas UDFs appear only where built-ins cannot express the
semantics (CIGAR walks, allele normalization, nearest-neighbor index probes).
"""

from .session import create_bio_session, get_or_create_session
from .sql_surface import bio_sql
from .operators.intervals import (
    clear_probe_caches,
    cluster,
    complement,
    count_overlaps,
    coverage,
    interval_join,
    merge,
    nearest,
    overlap,
    subtract,
)

__all__ = [
    "create_bio_session",
    "get_or_create_session",
    "bio_sql",
    "interval_join",
    "clear_probe_caches",
    "overlap",
    "count_overlaps",
    "coverage",
    "nearest",
    "merge",
    "cluster",
    "complement",
    "subtract",
]

__version__ = "0.1.0"
