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
the natural unit for the many-BAM 100 TB case.  For the single-huge-BAM
case, ``read_bam(..., split_size=...)`` plans BGZF block-aligned byte-range
splits (block table scanned from the 18-byte member headers — ~0.03% of the
file) and each task finds its first alignment-record boundary with a
validated-chain scan — the same index-free splitting approach published for
Hadoop-BAM (Niemenmaa et al., Bioinformatics 2012); a record belongs to the
split where it starts, and spanning records drain into subsequent blocks.

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


def _decompress_bgzf(data: bytes) -> bytes:
    """Decompress concatenated gzip members with a CLEAR error for every
    corruption mode — bad framing (BadGzipFile/EOFError), a corrupt
    DEFLATE body (zlib.error) — instead of a bare exception from deep
    inside the executor."""
    import zlib

    try:
        return gzip.decompress(data)  # BGZF = concatenated gzip members
    except (gzip.BadGzipFile, EOFError, zlib.error) as e:
        raise ValueError(
            "not a valid BGZF/BAM byte stream "
            f"({type(e).__name__}: {e}); {len(data)} bytes starting {data[:8]!r}"
        ) from e


def _iter_records(
    data: bytes, binary_cigar: bool, include_unmapped: bool
) -> Iterator[tuple]:
    """Yield (chrom, start0, flags, cigar, mapq) from raw .bam bytes."""
    raw = _decompress_bgzf(data)
    refs, off = _parse_header(raw)  # raises on a missing BAM\1 magic
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


# ---------------------------------------------------------------------------
# BGZF block machinery (SAM spec §4.1): every block is an independent gzip
# member whose BC extra subfield carries the compressed size, so a file can
# be scanned into a block table by reading only the 18-byte headers — the
# basis for intra-file splitting without a .bai index.
# ---------------------------------------------------------------------------


def bgzf_compress(data: bytes, block_payload: int = 0xFF00) -> bytes:
    """Compress ``data`` into a standards-compliant BGZF stream of
    ``block_payload``-byte members + the 28-byte EOF marker block.  The
    write-path seam (and the fixture generator for split tests)."""
    import zlib

    out = bytearray()
    for i in range(0, max(len(data), 1), block_payload):
        chunk = data[i : i + block_payload]
        co = zlib.compressobj(6, zlib.DEFLATED, -15)
        comp = co.compress(chunk) + co.flush()
        bsize = len(comp) + 25  # header 12 + extra 6 + crc/isize 8 - 1
        out += struct.pack(
            "<4BI2BH2B2H", 0x1F, 0x8B, 8, 4, 0, 0, 0xFF, 6, 66, 67, 2, bsize
        )
        out += comp
        out += struct.pack("<II", zlib.crc32(chunk) & 0xFFFFFFFF, len(chunk))
    # spec EOF marker (empty block)
    out += bytes.fromhex("1f8b08040000000000ff0600424302001b0003000000000000000000")
    return bytes(out)


def _scan_bgzf_blocks(f) -> list[tuple[int, int, int]]:
    """Block table [(compressed_offset, compressed_size, uncompressed_size)]
    by hopping the BC extra subfield — reads ~22 bytes per ~64 KB block."""
    blocks: list[tuple[int, int, int]] = []
    off = 0
    f.seek(0, 2)
    file_len = f.tell()
    while off < file_len:
        f.seek(off)
        hdr = f.read(12)
        if len(hdr) < 12 or hdr[:2] != b"\x1f\x8b":
            raise ValueError(f"not a BGZF stream at offset {off}")
        (xlen,) = struct.unpack_from("<H", hdr, 10)
        extra = f.read(xlen)
        bsize = None
        p = 0
        while p + 4 <= len(extra):
            si1, si2, slen = extra[p], extra[p + 1], struct.unpack_from("<H", extra, p + 2)[0]
            if si1 == 66 and si2 == 67 and slen == 2:
                bsize = struct.unpack_from("<H", extra, p + 4)[0] + 1
                break
            p += 4 + slen
        if bsize is None:
            raise ValueError(f"BGZF BC subfield missing at offset {off}")
        f.seek(off + bsize - 4)
        (isize,) = struct.unpack_from("<I", f.read(4), 0)
        blocks.append((off, bsize, isize))
        off += bsize
    return blocks


def _decompress_block(f, off: int, size: int) -> bytes:
    import zlib

    f.seek(off)
    return zlib.decompress(f.read(size), wbits=31)


def _looks_like_record(buf: bytes, o: int, n_ref: int) -> int | None:
    """Validate a candidate alignment-record start at offset ``o``; return
    the record's end offset if plausible, else None (Hadoop-BAM style
    boundary guessing — each field must satisfy the spec's invariants)."""
    if o + 36 > len(buf):
        return None
    (block_size,) = struct.unpack_from("<i", buf, o)
    if not 32 <= block_size <= (1 << 22):
        return None
    ref_id, pos = struct.unpack_from("<ii", buf, o + 4)
    if not (-1 <= ref_id < n_ref) or not (-1 <= pos < (1 << 31) - 1):
        return None
    l_read_name = buf[o + 12]
    if l_read_name < 1:
        return None
    (n_cigar_op,) = struct.unpack_from("<H", buf, o + 16)
    (l_seq,) = struct.unpack_from("<i", buf, o + 20)
    if l_seq < 0:
        return None
    fixed = 32 + l_read_name + 4 * n_cigar_op + (l_seq + 1) // 2 + l_seq
    if fixed > block_size + 4:
        return None
    return o + 4 + block_size


def _find_record_start(buf: bytes, n_ref: int, chain: int = 3) -> int | None:
    """First offset in ``buf`` where a chain of ``chain`` records validates
    back-to-back — the probability of a false positive chain is negligible."""
    for o in range(0, max(len(buf) - 36, 0)):
        p: int | None = o
        ok = 0
        while p is not None and p <= len(buf) and ok < chain:
            if p + 36 > len(buf):  # ran off the buffer mid-chain: accept
                ok = chain
                break
            p = _looks_like_record(buf, p, n_ref)
            if p is not None:
                ok += 1
        if ok >= chain:
            return o
    return None


def _list_bam_files(path: str) -> list[str]:
    import glob as _glob
    import os

    if os.path.isdir(path):
        return sorted(_glob.glob(os.path.join(path, "*.bam")))
    found = sorted(_glob.glob(path))
    if not found:
        raise FileNotFoundError(path)
    return found


# ---------------------------------------------------------------------------
# filesystem seam: the split reader's IO goes through (lister, opener) pairs
# so object stores plug in without touching the codec.  Openers/listers are
# captured in the task closure (cloudpickle), so registered callables work
# on executors too.
# ---------------------------------------------------------------------------

#: scheme -> (lister(path) -> list[str], opener(path) -> seekable binary file)
BAM_FILESYSTEMS: dict[str, tuple] = {}


def register_bam_filesystem(scheme: str, lister, opener) -> None:
    """Register a filesystem for ``scheme://`` BAM paths (e.g. a mocked
    remote store in tests, or a thin s3 client).  ``lister(path)`` expands
    globs/directories to concrete paths; ``opener(path)`` returns a
    seekable binary file object."""
    BAM_FILESYSTEMS[scheme] = (lister, opener)


def _local_opener(path: str):
    return open(path, "rb")


def _resolve_fs(path: str):
    """(lister, opener) for ``path``: local POSIX by default; registered
    schemes first; any other ``scheme://`` falls back to fsspec when
    available (s3/gs/az/http), with a clear error otherwise."""
    if "://" not in path:
        return _list_bam_files, _local_opener
    scheme = path.split("://", 1)[0]
    if scheme == "file":
        strip = lambda p: p.split("://", 1)[1]  # noqa: E731
        return (
            lambda p: _list_bam_files(strip(p)),
            lambda p: _local_opener(strip(p)),
        )
    if scheme in BAM_FILESYSTEMS:
        return BAM_FILESYSTEMS[scheme]
    try:
        import fsspec  # noqa: PLC0415
    except ImportError as exc:  # pragma: no cover - environment-dependent
        raise ImportError(
            f"reading {scheme}:// BAM paths needs either a registered "
            f"filesystem (register_bam_filesystem) or the fsspec package"
        ) from exc

    def _fsspec_list(p: str) -> list[str]:
        fs, _ = fsspec.core.url_to_fs(p)
        hits = fs.glob(p) if any(ch in p for ch in "*?[") else (
            [f"{x}" for x in fs.ls(p)] if fs.isdir(p) else [p]
        )
        out = []
        for h in hits:
            h = str(h)
            out.append(h if "://" in h else f"{scheme}://{h}")
        return sorted(x for x in out if x.endswith(".bam")) or sorted(out)

    def _fsspec_open(p: str):
        return fsspec.open(p, "rb").open()

    return _fsspec_list, _fsspec_open


def read_bam(
    spark: SparkSession,
    path: str,
    cigar_type: str = "string",
    include_unmapped: bool = False,
    split_size: int | None = None,
) -> DataFrame:
    """Read BAM file(s) into the alignment contract frame.

    ``path`` accepts globs/directories as ``binaryFile`` does.
    ``cigar_type='binary'`` keeps the packed little-endian u32 ops (the
    reference's optional zero-copy form, ``cigar.rs:177-260``) — ``depth``
    accepts both.  ``start`` is 0-based: pass ``zero_based=True`` to
    ``depth``.

    ``split_size`` (bytes of compressed input per task) switches to the
    intra-file splitting reader: the driver plans FIXED byte ranges (its
    only reads are the header blocks — O(header) per file, never O(file)),
    and each executor task discovers the BGZF blocks inside its own range
    (validated header-chain scan over a bounded 128 KiB window) and
    decompresses only those — a single 200 GB BAM then decodes on every
    core instead of one task.  IO goes through the filesystem seam:
    local/POSIX and ``file://`` built in, ``register_bam_filesystem`` for
    custom schemes, any other ``scheme://`` via fsspec when installed
    (s3/gs/az).
    """
    if cigar_type not in ("string", "binary"):
        raise ValueError(f"cigar_type must be 'string' or 'binary', got {cigar_type!r}")
    import pandas as pd

    binary = cigar_type == "binary"
    schema = BAM_SCHEMA_BIN if binary else BAM_SCHEMA_STR
    cols = ["chrom", "start", "flags", "cigar", "mapping_quality"]

    if split_size is not None:
        return _read_bam_split(
            spark, path, split_size, binary, include_unmapped, schema, cols
        )

    def decode(batches: Iterable["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            for content in pdf["content"]:
                rows = list(_iter_records(bytes(content), binary, include_unmapped))
                yield pd.DataFrame(rows, columns=cols)

    files = spark.read.format("binaryFile").load(path).select("content")
    return files.mapInPandas(decode, schema)


def _bc_block_size(buf: bytes, o: int) -> int | None:
    """BGZF member size from the BC extra subfield of the header at ``o``
    (None when the bytes at ``o`` are not a parseable BGZF header)."""
    if o + 12 > len(buf):
        return None
    if buf[o] != 0x1F or buf[o + 1] != 0x8B or buf[o + 2] != 8 or not (buf[o + 3] & 4):
        return None
    (xlen,) = struct.unpack_from("<H", buf, o + 10)
    if o + 12 + xlen > len(buf):
        return None
    p = o + 12
    end = o + 12 + xlen
    while p + 4 <= end:
        si1, si2, slen = buf[p], buf[p + 1], struct.unpack_from("<H", buf, p + 2)[0]
        if si1 == 66 and si2 == 67 and slen == 2:
            return struct.unpack_from("<H", buf, p + 4)[0] + 1
        p += 4 + slen
    return None


def _parse_leading_header(f) -> tuple[list[tuple[str, int]], int, int]:
    """Parse a BAM header reading ONLY the leading blocks it spans; returns
    (refs, header_end_uncompressed, file_len).  Driver-side work is O(header),
    never O(file) — a 200 GB BAM plans as fast as a 2 MB one."""
    f.seek(0, 2)
    file_len = f.tell()
    buf = b""
    off = 0
    while off < file_len:
        f.seek(off)
        hdr = f.read(18)
        bsize = _bc_block_size(hdr, 0)
        if bsize is None:
            # extra subfields longer than the probe: re-read with the
            # declared xlen
            if len(hdr) >= 12 and hdr[:2] == b"\x1f\x8b":
                (xlen,) = struct.unpack_from("<H", hdr, 10)
                f.seek(off)
                bsize = _bc_block_size(f.read(12 + xlen), 0)
            if bsize is None:
                raise ValueError(f"not a BGZF stream at offset {off}")
        buf += _decompress_block(f, off, bsize)
        off += bsize
        try:
            refs, hdr_end = _parse_header(buf)
            return refs, hdr_end, file_len
        except (struct.error, IndexError):
            continue
    raise ValueError("could not parse BAM header")


def _find_block_start(f, lo: int, hi: int, file_len: int) -> int | None:
    """First BGZF block starting in ``[lo, hi)``: scan the (bounded) window
    for a header whose BC size chains to another valid header (or EOF) —
    Hadoop-BAM-style validated guessing, executed in the TASK over its own
    byte neighborhood (the round-3 driver-side whole-file scan is gone)."""
    if lo == 0:
        return 0
    # BGZF members are contiguous and <= 64 KiB compressed, so the first
    # block starting at or after lo begins within 64 KiB of lo — the scan
    # window is bounded regardless of split size (one ranged read on
    # object stores)
    win_len = min(min(hi, file_len) - lo, 2 * 65536)
    if win_len <= 0:
        return None
    f.seek(lo)
    win = f.read(win_len)
    for o in range(len(win)):
        bsize = _bc_block_size(win, o)
        if bsize is None:
            continue
        nxt = lo + o + bsize
        if nxt == file_len:
            return lo + o
        if nxt > file_len:
            continue
        nh = win[o + bsize : o + bsize + 64]
        if len(nh) < 18:
            f.seek(nxt)
            nh = f.read(64)
        if _bc_block_size(nh, 0) is not None:
            return lo + o
    return None


def _read_bam_split(
    spark: SparkSession,
    path: str,
    split_size: int,
    binary: bool,
    include_unmapped: bool,
    schema: str,
    cols: list[str],
) -> DataFrame:
    """Intra-file splitting reader (see :func:`read_bam`)."""
    if split_size < 1:
        raise ValueError("split_size must be >= 1")
    import pandas as pd

    lister, opener = _resolve_fs(path)
    # ── driver: fixed byte-range splits + header parse (O(header) reads;
    # block discovery happens task-side inside each range) ──
    splits: list[tuple[str, int, int, int, bool]] = []
    refs_by_file: dict[str, list[tuple[str, int]]] = {}
    header_len_by_file: dict[str, int] = {}
    for fpath in lister(path):
        with opener(fpath) as f:
            refs, hdr_end, file_len = _parse_leading_header(f)
        refs_by_file[fpath] = refs
        header_len_by_file[fpath] = hdr_end
        lo = 0
        while lo < file_len:
            splits.append((fpath, lo, min(lo + split_size, file_len), file_len, lo == 0))
            lo += split_size
    sc = spark.sparkContext
    brefs = sc.broadcast(refs_by_file)
    bhdr = sc.broadcast(header_len_by_file)

    from ..session import local_frame

    split_df = local_frame(
        spark,
        [(i, *s) for i, s in enumerate(splits)],
        "sid long, path string, lo long, hi long, file_len long, first boolean",
    ).repartition(max(len(splits), 1), "sid")

    def decode(batches: Iterable["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            for _, row in pdf.iterrows():
                rows = list(
                    _iter_range_records(
                        opener, row["path"], int(row["lo"]), int(row["hi"]),
                        int(row["file_len"]), bool(row["first"]),
                        brefs.value[row["path"]], bhdr.value[row["path"]],
                        binary, include_unmapped,
                    )
                )
                yield pd.DataFrame(rows, columns=cols)

    return split_df.mapInPandas(decode, schema)


def _iter_range_records(
    opener,
    fpath: str,
    lo: int,
    hi: int,
    file_len: int,
    first: bool,
    refs: list[tuple[str, int]],
    header_len: int,
    binary_cigar: bool,
    include_unmapped: bool,
) -> Iterator[tuple]:
    """Decode the records owned by one byte-range split: blocks starting in
    [lo, hi), records starting in those blocks' bytes.  A trailing record
    spanning past the range drains by pulling further blocks."""
    import gzip as _gzip

    with opener(fpath) as f:
        start = _find_block_start(f, lo, hi, file_len)
        if start is None:
            return  # no block begins in this range
        # task-side block walk: ONE ranged read, then hop headers in memory
        # (the last owned block may extend past hi — extend the buffer)
        f.seek(start)
        comp = bytearray(f.read(max(0, min(hi, file_len) - start)))
        o = 0
        while start + o < min(hi, file_len):
            bsize = _bc_block_size(comp, o)
            if bsize is None:
                # header truncated at the buffer's end — extend from file
                f.seek(start + len(comp))
                more = f.read(65536)
                if more:
                    comp += more
                    bsize = _bc_block_size(comp, o)
            if bsize is None:
                raise ValueError(f"{fpath}: not a BGZF block at offset {start + o}")
            if o + bsize > len(comp):
                f.seek(start + len(comp))
                comp += f.read(o + bsize - len(comp))
            o += bsize
        comp_end = start + o
        buf = bytearray(_gzip.decompress(bytes(comp[:o])))
        owned_len = len(buf)
        tail_off = comp_end

        def pull_more() -> bool:
            nonlocal tail_off
            if tail_off >= file_len:
                return False
            f.seek(tail_off)
            hdr = f.read(18)
            bsize = _bc_block_size(hdr, 0)
            if bsize is None:
                (xlen,) = struct.unpack_from("<H", hdr, 10)
                f.seek(tail_off)
                bsize = _bc_block_size(f.read(12 + xlen), 0)
            if bsize is None:
                return False
            f.seek(tail_off)
            buf.extend(_gzip.decompress(f.read(bsize)))
            tail_off += bsize
            return True

        if first:
            off = header_len
        else:
            found = _find_record_start(bytes(buf), len(refs))
            if found is None:
                return  # split holds only the tail of a spanning record
            off = found

        n_ref = len(refs)
        while off < owned_len:
            while off + 4 > len(buf):
                if not pull_more():
                    return
            (block_size,) = struct.unpack_from("<i", buf, off)
            rec_end = off + 4 + block_size
            while rec_end > len(buf):
                if not pull_more():
                    return  # truncated trailing record
            ref_id, pos = struct.unpack_from("<ii", buf, off + 4)
            l_read_name = buf[off + 12]
            mapq = buf[off + 13]
            (n_cigar_op,) = struct.unpack_from("<H", buf, off + 16)
            (flag,) = struct.unpack_from("<H", buf, off + 18)
            if ref_id < 0 or pos < 0:
                if include_unmapped:
                    yield None, -1, flag, b"" if binary_cigar else "", mapq
                off = rec_end
                continue
            cig_off = off + 36 + l_read_name
            if binary_cigar:
                cigar: object = bytes(buf[cig_off : cig_off + 4 * n_cigar_op])
            else:
                ops = struct.unpack_from("<%dI" % n_cigar_op, buf, cig_off)
                cigar = "".join("%d%s" % (op >> 4, CIGAR_OPS[op & 0xF]) for op in ops)
            yield refs[ref_id][0], pos, flag, cigar, mapq
            off = rec_end


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
                raw = _decompress_bgzf(bytes(content))
                refs, _ = _parse_header(raw)
                yield pd.DataFrame(refs, columns=["contig", "length"])

    files = spark.read.format("binaryFile").load(path).select("content")
    return files.mapInPandas(decode, "contig string, length long").distinct()
