"""S1 BAM source + mosdepth-compat pileup on the reference's real mini-BAMs
(`bio-function-pileup/tests/data/{ovl,overlapping-pairs}.bam`), asserting the
exact block expectations of `tests/mosdepth_compat.rs:119-242`."""

from __future__ import annotations

import pytest

from datafusion_bio_functions_spark.operators.pileup import depth
from datafusion_bio_functions_spark.sources.bam import bam_contig_lengths, read_bam

OVL = "/root/reference/datafusion/bio-function-pileup/tests/data/ovl.bam"
PAIRS = "/root/reference/datafusion/bio-function-pileup/tests/data/overlapping-pairs.bam"


def _blocks(df, contig):
    return sorted(
        (r.contig, r.pos_start, r.pos_end, r.coverage)
        for r in df.collect()
        if r.contig == contig
    )


def test_read_bam_contract(spark):
    df = read_bam(spark, OVL)
    assert df.columns == ["chrom", "start", "flags", "cigar", "mapping_quality"]
    rows = df.collect()
    assert len(rows) > 0
    assert all(r.start >= 0 for r in rows)
    assert all(set(r.cigar) <= set("0123456789MIDNSHP=X") for r in rows)


def test_ovl_blocks_zero_based(spark):
    """mosdepth_compat.rs:140-142: MT blocks (0,5,1), (6,41,2), (42,79,1)."""
    bam = read_bam(spark, OVL)
    out = depth(bam, zero_based=True)
    mt = _blocks(out, "MT")
    assert mt == [("MT", 0, 5, 1), ("MT", 6, 41, 2), ("MT", 42, 79, 1)]


def test_ovl_blocks_one_based(spark):
    """mosdepth_compat.rs:240-242: 1-based MT blocks (1,6,1), (7,42,2), (43,80,1)."""
    bam = read_bam(spark, OVL)
    one_based = bam.withColumn("start", bam.start + 1)
    out = depth(one_based, zero_based=False)
    mt = _blocks(out, "MT")
    assert mt == [("MT", 1, 6, 1), ("MT", 7, 42, 2), ("MT", 43, 80, 1)]


def test_overlapping_pairs_no_dedup(spark):
    """mosdepth_compat.rs:180: overlapping mates double-count → chr1
    (565173, 565252, 2) — no mate-overlap deduplication, unlike mosdepth's
    default mode."""
    bam = read_bam(spark, PAIRS)
    out = depth(bam, zero_based=True)
    assert _blocks(out, "1") == [("1", 565173, 565252, 2)]


def test_ovl_per_base(spark):
    """mosdepth_compat.rs:309-325: per-base 0-based MT coverage spot values."""
    bam = read_bam(spark, OVL)
    out = depth(bam, zero_based=True, per_base=True)
    mt = {r.pos: r.coverage for r in out.collect() if r.contig == "MT"}
    assert mt[0] == 1 and mt[5] == 1
    assert mt[6] == 2 and mt[41] == 2
    assert mt[42] == 1
    assert min(mt) == 0


def test_binary_cigar_equals_string(spark):
    sb = read_bam(spark, OVL, cigar_type="string")
    bb = read_bam(spark, OVL, cigar_type="binary")
    a = _blocks(depth(sb, zero_based=True), "MT")
    b = _blocks(depth(bb, zero_based=True), "MT")  # binary dtype auto-detected
    assert a == b


def test_contig_lengths(spark):
    lens = {r.contig: r.length for r in bam_contig_lengths(spark, OVL).collect()}
    assert lens.get("MT", 0) > 0


def test_bad_cigar_type(spark):
    with pytest.raises(ValueError, match="cigar_type"):
        read_bam(spark, OVL, cigar_type="wat")


def test_per_base_dense_with_lengths(spark):
    """Reference dense mode (header contig lengths → every position incl.
    zeros, coverage.rs:291-293): MT emits [0..len) rows, zeros outside the
    covered prefix."""
    bam = read_bam(spark, OVL)
    lens = bam_contig_lengths(spark, OVL)
    mt_len = {r.contig: r.length for r in lens.collect()}["MT"]
    out = depth(bam, zero_based=True, per_base=True,
                contig_lengths=lens.filter(lens.contig == "MT"))
    rows = {r.pos: r.coverage for r in out.collect() if r.contig == "MT"}
    assert len(rows) == mt_len
    assert min(rows) == 0 and max(rows) == mt_len - 1
    assert rows[0] == 1 and rows[6] == 2 and rows[42] == 1
    assert rows[80] == 0 and rows[mt_len - 1] == 0
    # 1-based dense: positions [1..len]
    one = bam.withColumn("start", bam.start + 1)
    out1 = depth(one, per_base=True, contig_lengths=lens.filter(lens.contig == "MT"))
    rows1 = {r.pos: r.coverage for r in out1.collect() if r.contig == "MT"}
    assert len(rows1) == mt_len and min(rows1) == 1 and max(rows1) == mt_len
    assert rows1[1] == 1 and rows1[7] == 2 and rows1[43] == 1


def test_per_base_dense_uncovered_contig(spark):
    bam = read_bam(spark, OVL)
    lens = spark.createDataFrame([("MT", 100), ("chrZ", 5)], ["contig", "length"])
    out = depth(bam, zero_based=True, per_base=True, contig_lengths=lens)
    z = sorted((r.pos, r.coverage) for r in out.collect() if r.contig == "chrZ")
    assert z == [(0, 0), (1, 0), (2, 0), (3, 0), (4, 0)]


def test_read_sam_matches_read_bam(spark, tmp_path):
    """SAM text rendered from the decoded BAM parses back to identical
    alignments and identical depth blocks; gzip works transparently."""
    import gzip as _gzip

    from datafusion_bio_functions_spark.sources.bam import read_sam

    bam = read_bam(spark, OVL)
    rows = bam.collect()
    sam_lines = ["@HD\tVN:1.6", "@SQ\tSN:MT\tLN:16569"]
    for r in rows:
        sam_lines.append(
            f"q\t{r.flags}\t{r.chrom}\t{r.start + 1}\t{r.mapping_quality}\t{r.cigar}\t*\t0\t0\t*\t*"
        )
    plain = tmp_path / "t.sam"
    plain.write_text("\n".join(sam_lines) + "\n")
    gz = tmp_path / "t.sam.gz"
    gz.write_bytes(_gzip.compress(("\n".join(sam_lines) + "\n").encode()))

    for p in (plain, gz):
        sam = read_sam(spark, str(p))
        assert sorted(map(tuple, sam.collect())) == sorted(map(tuple, rows))
        assert _blocks(depth(sam, zero_based=True), "MT") == _blocks(
            depth(bam, zero_based=True), "MT"
        )


def test_vcf_gz_roundtrip(spark, tmp_path):
    """read_vcf on .vcf.gz (BGZF is gzip-compatible; Spark's text source
    decodes it transparently)."""
    import gzip as _gzip

    from datafusion_bio_functions_spark.sources.readers import read_vcf

    body = "##fileformat=VCFv4.2\n#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n" \
           "1\t100\trs1\tA\tT\t.\tPASS\t.\n1\t200\t.\tG\tC\t.\t.\t.\n"
    p = tmp_path / "t.vcf.gz"
    p.write_bytes(_gzip.compress(body.encode()))
    got = read_vcf(spark, str(p))
    rows = {r.start: r for r in got.collect()}
    assert set(rows) == {100, 200}
    assert rows[100].id == "rs1" and rows[100].alt == "T"


# ---------------------------------------------------------------------------
# intra-file BGZF splitting (read_bam split_size path)
# ---------------------------------------------------------------------------


def _make_bam_bytes(n_records=400, seed=11):
    """Synthesize raw (uncompressed) BAM bytes: 2 contigs, variable-length
    records so record boundaries land mid-block once BGZF-compressed."""
    import random
    import struct

    text = b"@HD\tVN:1.6\n@SQ\tSN:chr1\tLN:100000\n@SQ\tSN:chr2\tLN:50000\n"
    refs = [("chr1", 100000), ("chr2", 50000)]
    raw = b"BAM\x01" + struct.pack("<i", len(text)) + text + struct.pack("<i", len(refs))
    for name, ln in refs:
        nb = name.encode() + b"\x00"
        raw += struct.pack("<i", len(nb)) + nb + struct.pack("<i", ln)
    rng = random.Random(seed)
    expect = []
    for i in range(n_records):
        ref_id = rng.randrange(2)
        pos = rng.randrange(0, 40_000)
        mapq = rng.randrange(0, 60)
        flag = rng.choice([0, 16, 1024])
        name = (b"r%06d" % i) + b"\x00"
        l_seq = rng.choice([8, 40, 151, 600])
        cig_ops = [(l_seq << 4) | 0]  # "<l_seq>M"
        seq = bytes((l_seq + 1) // 2)
        qual = bytes(l_seq)
        data = (
            struct.pack(
                "<iiBBHHHiiii", ref_id, pos, len(name), mapq, 0,
                len(cig_ops), flag, l_seq, -1, -1, 0,
            )
            + name
            + struct.pack("<%dI" % len(cig_ops), *cig_ops)
            + seq
            + qual
        )
        raw += struct.pack("<i", len(data)) + data
        expect.append((refs[ref_id][0], pos, flag, f"{l_seq}M", mapq))
    return raw, expect


@pytest.mark.parametrize("block_payload,split_size", [(1024, 4096), (512, 1500)])
def test_read_bam_split_equals_whole(spark, tmp_path, block_payload, split_size):
    """Block-aligned splits + validated record-boundary discovery must
    reproduce the file-at-once decode exactly — including records spanning
    BGZF block and split boundaries."""
    from datafusion_bio_functions_spark.sources.bam import bgzf_compress

    raw, expect = _make_bam_bytes()
    p = tmp_path / "big.bam"
    p.write_bytes(bgzf_compress(raw, block_payload=block_payload))

    whole = sorted(map(tuple, read_bam(spark, str(p)).collect()))
    split = sorted(map(tuple, read_bam(spark, str(p), split_size=split_size).collect()))
    assert split == whole == sorted(expect)
    # genuinely multi-split: the plan produced more than one task's worth
    from datafusion_bio_functions_spark.sources.bam import _scan_bgzf_blocks

    with open(p, "rb") as f:
        assert len(_scan_bgzf_blocks(f)) > 4


def test_read_bam_split_on_reference_mini_bam(spark):
    whole = sorted(map(tuple, read_bam(spark, OVL).collect()))
    split = sorted(map(tuple, read_bam(spark, OVL, split_size=1000).collect()))
    assert split == whole


def test_read_bam_split_mock_remote_scheme(spark, tmp_path):
    """The filesystem seam: a registered mock:// scheme (backed by a local
    file but opened ONLY through the registered opener) must work end-to-end
    for the split reader — lister on the driver, opener in both the driver
    planning phase and executor tasks (closure-captured)."""
    from datafusion_bio_functions_spark.sources.bam import (
        BAM_FILESYSTEMS,
        bgzf_compress,
        register_bam_filesystem,
    )

    raw, expect = _make_bam_bytes(n_records=300)
    p = tmp_path / "remote.bam"
    p.write_bytes(bgzf_compress(raw, block_payload=1024))
    local = str(p)

    register_bam_filesystem(
        "mock",
        lambda path: [path],
        lambda path: open(path.replace("mock://", "/"), "rb"),
    )
    try:
        got = sorted(
            map(tuple, read_bam(spark, "mock://" + local.lstrip("/"),
                                split_size=2048).collect())
        )
        assert got == sorted(expect)
    finally:
        BAM_FILESYSTEMS.pop("mock", None)


def test_read_bam_split_driver_reads_header_only(spark, tmp_path):
    """Driver-side planning reads O(header) bytes regardless of file size
    (VERDICT r3 #4: the round-3 planner scanned every block header on the
    driver).  A >100 MB synthetic BAM — one incompressible block replicated
    — must plan with under 1 MB of driver reads, and the split read must
    agree with the whole-file decode on counts."""
    import struct as _struct
    import zlib

    from datafusion_bio_functions_spark.sources.bam import (
        BAM_FILESYSTEMS,
        bgzf_compress,
        register_bam_filesystem,
    )

    # header-only BAM prefix as its own BGZF member(s)
    text = b"@HD\tVN:1.6\n@SQ\tSN:chr1\tLN:1000000\n"
    hdr_raw = (
        b"BAM\x01" + _struct.pack("<i", len(text)) + text + _struct.pack("<i", 1)
        + _struct.pack("<i", 5) + b"chr1\x00" + _struct.pack("<i", 1000000)
    )
    hdr_comp = bgzf_compress(hdr_raw, block_payload=0xFF00)[:-28]  # drop EOF marker

    # one block of incompressible records, replicated: generation is O(1)
    # in target size while the compressed payload stays >100 MB
    import random

    rng = random.Random(7)
    rec_raw = b""
    n_per_block = 0
    while len(rec_raw) < 0xF000:
        name = bytes(rng.randrange(65, 91) for _ in range(24)) + b"\x00"
        data = (
            _struct.pack("<iiBBHHHiiii", 0, 500 + n_per_block, len(name),
                         30, 0, 1, 0, 0, -1, -1, 0)
            + name + _struct.pack("<I", (100 << 4) | 0)
        )
        rec_raw += _struct.pack("<i", len(data)) + data
        n_per_block += 1
    co = zlib.compressobj(0, zlib.DEFLATED, -15)  # stored: incompressible
    comp = co.compress(rec_raw) + co.flush()
    bsize = len(comp) + 25
    block = (
        _struct.pack("<4BI2BH2B2H", 0x1F, 0x8B, 8, 4, 0, 0, 0xFF, 6, 66, 67, 2, bsize)
        + comp + _struct.pack("<II", zlib.crc32(rec_raw) & 0xFFFFFFFF, len(rec_raw))
    )
    n_blocks = (110 * 1024 * 1024) // len(block) + 1
    eof = bytes.fromhex(
        "1f8b08040000000000ff0600424302001b0003000000000000000000"
    )
    p = tmp_path / "huge.bam"
    with open(p, "wb") as f:
        f.write(hdr_comp)
        for _ in range(n_blocks):
            f.write(block)
        f.write(eof)
    assert p.stat().st_size > 100 * 1024 * 1024

    counted = {"driver_bytes": 0}

    class CountingFile:
        def __init__(self, path):
            self._f = open(path, "rb")

        def read(self, n=-1):
            b = self._f.read(n)
            counted["driver_bytes"] += len(b)
            return b

        def seek(self, *a):
            return self._f.seek(*a)

        def tell(self):
            return self._f.tell()

        def __enter__(self):
            return self

        def __exit__(self, *a):
            self._f.close()

    register_bam_filesystem(
        "countmock", lambda path: [path],
        lambda path: CountingFile(path.replace("countmock://", "/")),
    )
    try:
        df = read_bam(
            spark, "countmock://" + str(p).lstrip("/"), split_size=16 * 1024 * 1024
        )
        # planning (construction) happened above — executors open their own
        # (non-counting? no: same opener, but those run in worker processes
        # whose counters are separate) — so counted reflects DRIVER reads
        driver_bytes = counted["driver_bytes"]
        assert driver_bytes < 1 * 1024 * 1024, f"driver read {driver_bytes} bytes"
        assert df.count() == n_blocks * n_per_block
    finally:
        BAM_FILESYSTEMS.pop("countmock", None)


def test_bgzf_compress_roundtrip():
    import gzip

    from datafusion_bio_functions_spark.sources.bam import bgzf_compress

    data = b"x" * 200_000
    comp = bgzf_compress(data, block_payload=4096)
    assert gzip.decompress(comp) == data


def test_read_bam_clear_error_on_non_bam(spark, tmp_path):
    """A non-BGZF file raises a clear ValueError naming the framing problem
    instead of a bare BadGzipFile from deep inside the worker; an empty
    file yields zero rows."""
    import gzip as _gzip

    import pytest as _pytest

    bad = tmp_path / "garbage.bam"
    bad.write_bytes(b"not a bam at all" * 10)
    with _pytest.raises(Exception, match="BGZF/BAM byte stream"):
        read_bam(spark, str(bad)).count()
    # valid gzip but not BAM content → the BAM\1 magic error surfaces
    notbam = tmp_path / "notbam.bam"
    notbam.write_bytes(_gzip.compress(b"plain text payload"))
    with _pytest.raises(Exception, match="missing BAM"):
        read_bam(spark, str(notbam)).count()
    empty = tmp_path / "empty.bam"
    empty.write_bytes(b"")
    assert read_bam(spark, str(empty)).count() == 0


def test_bam_corrupt_deflate_clear_error(spark, tmp_path):
    """A BGZF stream with valid gzip framing but a corrupt DEFLATE body
    (zlib.error, not BadGzipFile) still gets the clear codec error, on
    both the record and the contig-lengths decode paths."""
    import gzip as _gzip

    import pytest as _pytest

    good = _gzip.compress(b"payload" * 50)
    corrupt = good[:20] + bytes(b ^ 0xFF for b in good[20:40]) + good[40:]
    bad = tmp_path / "corrupt.bam"
    bad.write_bytes(corrupt)
    with _pytest.raises(Exception, match="not a valid BGZF/BAM byte stream"):
        read_bam(spark, str(bad)).count()
    with _pytest.raises(Exception, match="not a valid BGZF/BAM byte stream"):
        bam_contig_lengths(spark, str(bad)).count()
