"""S1: distributed BAM source — pure-Python BGZF/BAM codec over Spark.

The reference reads BAM through the external ``datafusion-bio-formats``
crate (usage ``README.md:569-599``, ``bio-function-pileup/src/
table_function.rs:125-140``) producing the alignment contract
``(chrom, start, flags, cigar, mapping_quality)`` with optional packed
binary CIGARs (``README.md:580-582``) and contig lengths carried from the
BAM header (``bio-function-pileup/src/events.rs:219-229``).

Here the codec is implemented from the public SAM/BAM specification
(https://samtools.github.io/hts-specs/SAMv1.pdf): BGZF is a sequence of
concatenated gzip members (``gzip.decompress`` handles them natively), and
alignment records are fixed-layout little-endian structs.  Distribution
model: ``spark.read.format("binaryFile")`` lists the input (one row per
.bam file, pruned to the ``content`` column) and an Arrow-batched
``mapInPandas`` decodes each file on an executor — file-level parallelism,
the natural unit for the many-BAM 100 TB case.  Intra-file splitting would
need the .bai index's BGZF virtual offsets; out of scope here, noted for
parity (a single huge BAM decodes in one task).

``start`` is emitted exactly as stored — 0-based (BAM convention) — so
``depth(bam_df, zero_based=True)`` reproduces the reference's mosdepth
compatibility expectations (``tests/mosdepth_compat.rs:119-242``).
"""

from __future__ import annotations

import gzip
import struct
from typing import Iterable, Iterator

from pyspark.sql import DataFrame, SparkSession

#: CIGAR opcode characters in BAM encoding order (SAM spec §4.2).
CIGAR_OPS = "MIDNSHP=X"

BAM_SCHEMA_STR = (
    "chrom string, start long, flags int, cigar string, mapping_quality int"
)
BAM_SCHEMA_BIN = (
    "chrom string, start long, flags int, cigar binary, mapping_quality int"
)


def _parse_header(raw: bytes) -> tuple[list[tuple[str, int]], int]:
    """Parse the uncompressed BAM header; return ([(name, length)], offset
    of the first alignment record)."""
    if raw[:4] != b"BAM\x01":
        raise ValueError("not a BAM stream (missing BAM\\1 magic)")
    off = 4
    (l_text,) = struct.unpack_from("<i", raw, off)
    off += 4 + l_text
    (n_ref,) = struct.unpack_from("<i", raw, off)
    off += 4
    refs: list[tuple[str, int]] = []
    for _ in range(n_ref):
        (l_name,) = struct.unpack_from("<i", raw, off)
        off += 4
        name = raw[off : off + l_name - 1].decode()  # NUL-terminated
        off += l_name
        (l_ref,) = struct.unpack_from("<i", raw, off)
        off += 4
        refs.append((name, l_ref))
    return refs, off


def _iter_records(
    data: bytes, binary_cigar: bool, include_unmapped: bool
) -> Iterator[tuple]:
    """Yield (chrom, start0, flags, cigar, mapq) from raw .bam bytes."""
    raw = gzip.decompress(data)  # BGZF = concatenated gzip members
    refs, off = _parse_header(raw)
    n = len(raw)
    while off < n:
        (block_size,) = struct.unpack_from("<i", raw, off)
        off += 4
        rec_end = off + block_size
        ref_id, pos = struct.unpack_from("<ii", raw, off)
        l_read_name = raw[off + 8]
        mapq = raw[off + 9]
        (n_cigar_op,) = struct.unpack_from("<H", raw, off + 12)
        (flag,) = struct.unpack_from("<H", raw, off + 14)
        if ref_id < 0 or pos < 0:
            if include_unmapped:
                yield None, -1, flag, b"" if binary_cigar else "", mapq
            off = rec_end
            continue
        cig_off = off + 32 + l_read_name
        if binary_cigar:
            cigar: object = raw[cig_off : cig_off + 4 * n_cigar_op]
        else:
            ops = struct.unpack_from("<%dI" % n_cigar_op, raw, cig_off)
            cigar = "".join(
                "%d%s" % (op >> 4, CIGAR_OPS[op & 0xF]) for op in ops
            )
        yield refs[ref_id][0], pos, flag, cigar, mapq
        off = rec_end


def read_bam(
    spark: SparkSession,
    path: str,
    cigar_type: str = "string",
    include_unmapped: bool = False,
) -> DataFrame:
    """Read BAM file(s) into the alignment contract frame.

    ``path`` accepts globs/directories as ``binaryFile`` does.
    ``cigar_type='binary'`` keeps the packed little-endian u32 ops (the
    reference's optional zero-copy form, ``cigar.rs:177-260``) — ``depth``
    accepts both.  ``start`` is 0-based: pass ``zero_based=True`` to
    ``depth``.
    """
    if cigar_type not in ("string", "binary"):
        raise ValueError(f"cigar_type must be 'string' or 'binary', got {cigar_type!r}")
    import pandas as pd

    binary = cigar_type == "binary"
    schema = BAM_SCHEMA_BIN if binary else BAM_SCHEMA_STR
    cols = ["chrom", "start", "flags", "cigar", "mapping_quality"]

    def decode(batches: Iterable["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            for content in pdf["content"]:
                rows = list(_iter_records(bytes(content), binary, include_unmapped))
                yield pd.DataFrame(rows, columns=cols)

    files = spark.read.format("binaryFile").load(path).select("content")
    return files.mapInPandas(decode, schema)


def read_sam(spark: SparkSession, path: str) -> DataFrame:
    """Read SAM (the text form of BAM; tab-separated, ``@``-prefixed
    headers) into the alignment contract frame.  Pure Spark text parsing —
    columns per SAM spec §1.4: QNAME FLAG RNAME POS MAPQ CIGAR ...
    ``start`` is converted to 0-based to match :func:`read_bam`, so
    ``depth(df, zero_based=True)`` treats both sources identically.
    Unmapped records (RNAME ``*``) are dropped, as in :func:`read_bam`'s
    default.  Gzip-compressed ``.sam.gz`` works transparently (Spark's text
    source handles the codec)."""
    from pyspark.sql import functions as F

    p = F.split(F.col("value"), "\t")
    # F.get (null-safe) rather than getItem: Catalyst may reorder the
    # header/size filters after column extraction, so out-of-bounds access
    # must yield NULL (dropped below), never throw
    lines = spark.read.text(path).filter(~F.col("value").startswith("@"))
    return (
        lines.select(
            F.get(p, 2).alias("chrom"),
            (F.get(p, 3).cast("long") - 1).alias("start"),  # SAM POS is 1-based
            F.get(p, 1).cast("int").alias("flags"),
            F.get(p, 5).alias("cigar"),
            F.get(p, 4).cast("int").alias("mapping_quality"),
        )
        .filter(F.col("chrom").isNotNull() & (F.col("chrom") != "*") & F.col("cigar").isNotNull())
    )


def bam_contig_lengths(spark: SparkSession, path: str) -> DataFrame:
    """Contig name/length pairs from the BAM header(s) — the reference rides
    these in schema metadata for dense-mode pileup and uses them as the
    complement view bounds.  Distinct across files."""
    import pandas as pd

    def decode(batches: Iterable["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            for content in pdf["content"]:
                raw = gzip.decompress(bytes(content))
                refs, _ = _parse_header(raw)
                yield pd.DataFrame(refs, columns=["contig", "length"])

    files = spark.read.format("binaryFile").load(path).select("content")
    return files.mapInPandas(decode, "contig string, length long").distinct()
