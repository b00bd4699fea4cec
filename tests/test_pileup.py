"""Pileup depth tests: hand-computed expectations per FIXTURES.md F4/F9 and
the reference's own unit-test style (physical_exec.rs:570-1043)."""

from __future__ import annotations

import struct

import pytest
from pyspark.sql import functions as F

from datafusion_bio_functions_spark.operators.pileup import depth

ALN_COLS = ["chrom", "start", "flags", "cigar", "mapping_quality"]


def aln(spark, rows):
    return spark.createDataFrame(rows, ALN_COLS)


def blocks_of(df):
    return sorted(
        (r["contig"], r["pos_start"], r["pos_end"], r["coverage"]) for r in df.collect()
    )


def test_two_overlapping_reads(spark):
    # FIXTURES F9: 100M@100 + 100M@150 (0-based starts)
    df = aln(spark, [("chr1", 100, 0, "100M", 60), ("chr1", 150, 0, "100M", 60)])
    got = blocks_of(depth(df, zero_based=True))
    # reference block convention: inclusive ends in both modes
    # (coverage.rs:51, mosdepth_compat.rs:140-142)
    assert got == [
        ("chr1", 100, 149, 1),
        ("chr1", 150, 199, 2),
        ("chr1", 200, 249, 1),
    ]


def test_one_based_default(spark):
    df = aln(spark, [("chr1", 101, 0, "50M", 60)])
    assert blocks_of(depth(df)) == [("chr1", 101, 150, 1)]


def test_cigar_insertion_softclip(spark):
    # 10M2I5M: insertion consumes no reference → one 15-base block;
    # 10S90M: soft clip consumes no reference
    df = aln(spark, [("chr1", 100, 0, "10M2I5M", 60), ("chr2", 100, 0, "10S90M", 60)])
    assert blocks_of(depth(df)) == [("chr1", 100, 114, 1), ("chr2", 100, 189, 1)]


def test_cigar_deletion_and_skip(spark):
    # 50M10D50M: deletion consumes reference but not coverage → gap in depth?
    # No: D consumes reference silently → two M runs 100-149 and 160-209,
    # the 10 deleted bases have no coverage contribution from this read.
    df = aln(spark, [("chr1", 100, 0, "50M10D50M", 60)])
    assert blocks_of(depth(df)) == [("chr1", 100, 149, 1), ("chr1", 160, 209, 1)]
    # 20M1000N20M: intron skip — far apart blocks
    df2 = aln(spark, [("chr1", 100, 0, "20M1000N20M", 60)])
    assert blocks_of(depth(df2)) == [("chr1", 100, 119, 1), ("chr1", 1120, 1139, 1)]


def test_flag_and_mapq_filters(spark):
    df = aln(
        spark,
        [
            ("chr1", 100, 0, "50M", 60),
            ("chr1", 100, 1024, "50M", 60),  # DUP → filtered by default 1796
            ("chr1", 100, 0, "50M", 5),  # low MAPQ
        ],
    )
    assert blocks_of(depth(df, min_mapq=20)) == [("chr1", 100, 149, 1)]
    # flag filter disabled → DUP counts
    assert blocks_of(depth(df, flag_mask=0, min_mapq=0))[0][3] == 3


def test_per_base_mode(spark):
    df = aln(spark, [("chr1", 100, 0, "3M", 60), ("chr1", 101, 0, "3M", 60)])
    rows = sorted((r["contig"], r["pos"], r["coverage"]) for r in depth(df, per_base=True).collect())
    assert rows == [
        ("chr1", 100, 1),
        ("chr1", 101, 2),
        ("chr1", 102, 2),
        ("chr1", 103, 1),
    ]


def test_binary_cigar(spark):
    # 100M packed as little-endian u32: (100 << 4) | 0 (M)
    raw = struct.pack("<I", (100 << 4) | 0)
    raw2 = struct.pack("<II", (10 << 4) | 0, (5 << 4) | 2)  # 10M5D → only 10M covers
    df = spark.createDataFrame(
        [("chr1", 100, 0, bytearray(raw), 60), ("chr2", 100, 0, bytearray(raw2), 60)],
        "chrom string, start int, flags int, cigar binary, mapping_quality int",
    )
    got = blocks_of(depth(df))
    assert got == [("chr1", 100, 199, 1), ("chr2", 100, 109, 1)]


def test_partition_invariance(spark):
    rows = [("chr%d" % (i % 3 + 1), 100 + 7 * i, 0, "%dM" % (20 + i % 50), 60) for i in range(200)]
    df = aln(spark, rows)
    base = blocks_of(depth(df))
    for n in (1, 4, 16):
        assert blocks_of(depth(df.repartition(n))) == base


def test_depth_matches_duckdb_oracle(spark, oracle):
    """Simple all-M alignments: oracle computes the same event algebra in SQL."""
    import pandas as pd

    from datafusion_bio_functions_spark.plans.oracle import depth_blocks_sql

    rows = [("chr%d" % (i % 2 + 1), 50 + 13 * i, 0, "%dM" % (30 + (i * 7) % 40), 60) for i in range(100)]
    df = aln(spark, rows)
    got = blocks_of(depth(df))
    pdf = pd.DataFrame(
        [(c, st, 30 + (i * 7) % 40) for i, (c, st, _, _, _) in enumerate(rows)],
        columns=["chrom", "start", "ref_len"],
    )
    oracle.register("aln_simple", pdf)
    want = oracle.sql(depth_blocks_sql("SELECT * FROM aln_simple")).df()
    want_rows = sorted(
        (r.contig, int(r.pos_start), int(r.pos_end), int(r.coverage)) for r in want.itertuples()
    )
    assert got == want_rows


def test_depth_chunked_equals_window(spark):
    """The chunked (parallel prefix sum) depth path must equal the window
    path exactly — including blocks spanning chunk edges."""
    import random as _r

    rnd = _r.Random(11)
    rows = []
    for contig in ("chr1", "chr2"):
        for _ in range(500):
            s = rnd.randrange(1, 50_000)
            rows.append((contig, s, 0, f"{rnd.randrange(1, 300)}M", 60))
    df = spark.createDataFrame(
        rows, "chrom string, start long, flags int, cigar string, mapping_quality int"
    )

    def canon(out):
        return sorted(map(tuple, out.collect()))

    want = canon(depth(df, algorithm="window"))
    assert canon(depth(df, algorithm="chunked", chunk_width=1000)) == want
    # grouped numpy kernel and the auto route (fits -> grouped) too
    assert canon(depth(df, algorithm="grouped")) == want
    assert canon(depth(df)) == want
    # per-base expansion identical too
    per_base_want = canon(depth(df, per_base=True, algorithm="window"))
    assert canon(
        depth(df, per_base=True, algorithm="chunked", chunk_width=1000)
    ) == per_base_want
    assert canon(depth(df, per_base=True, algorithm="grouped")) == per_base_want
    with pytest.raises(ValueError):
        depth(df, algorithm="hyperspeed")


def test_depth_grouped_mixed_cigars_equals_window(spark):
    """grouped must agree with window when both CIGAR branches are active
    (simple '<n>M' fast projection + aggregate()-walk slow branch)."""
    rows = [
        ("chr1", 100, 0, "50M", 60),
        ("chr1", 120, 0, "10M5D10M", 60),      # D consumes reference
        ("chr1", 130, 0, "5S20M3I7M", 60),     # S/I consume none
        ("chr2", 10, 0, "8M", 60),
        ("chr2", 18, 0, "4M2N4M", 60),         # N consumes reference
        ("chr2", 500, 1024, "9M", 60),         # flag-filtered out
        ("chr2", 600, 0, "9M", 5),             # mapq-filtered out
    ]
    df = spark.createDataFrame(
        rows, "chrom string, start long, flags int, cigar string, mapping_quality int"
    )

    def canon(out):
        return sorted(map(tuple, out.collect()))

    want = canon(depth(df, min_mapq=20, algorithm="window"))
    assert canon(depth(df, min_mapq=20, algorithm="grouped")) == want
    assert want  # non-trivial


def test_over_cap_contig_probe_is_not_prefix_biased(spark):
    """Over the grouped guard the window-vs-chunked route needs the real
    contig count: a contig-sorted input whose HEAD shows one contig must
    still route to 'window' when the full frame carries >= parallelism
    contigs (the bounded prefix probe alone would misroute to 'chunked')."""
    from datafusion_bio_functions_spark.operators import pileup as P

    par = spark.sparkContext.defaultParallelism
    n_contigs = par + 2
    rows = []
    for ci in range(n_contigs):
        for s in range(1, 6):
            rows.append((f"chr{ci:03d}", s * 10, 0, "5M", 60))
    # contig-sorted single partition: any prefix sample sees chr000 first
    df = spark.createDataFrame(
        rows, "chrom string, start long, flags int, cigar string, mapping_quality int"
    ).coalesce(1).sortWithinPartitions("chrom", "start")

    spark.conf.set("spark.bio.depth.groupedMaxSegments", "3")  # force over-cap
    try:
        P._GROUPED_FIT_MEMO.clear()
        simple = None
        fits, _, probed = P._probe_alignments(df, simple, "chrom")
        assert not fits
        assert probed >= par, f"probe saw {probed} contigs, expected >= {par}"
        assert P._over_cap_algorithm(df, probed) == "window"
        # and the over-cap routes still agree with each other on values
        def canon(out):
            return sorted(map(tuple, out.collect()))
        want = canon(P.depth(df, algorithm="window"))
        assert canon(P.depth(df)) == want
    finally:
        spark.conf.unset("spark.bio.depth.groupedMaxSegments")
        P._GROUPED_FIT_MEMO.clear()


def test_binary_cigar_edge_battery(spark):
    """Replays the reference's binary-CIGAR unit batteries end-to-end
    (cigar.rs test_binary_*_events/_depth, :581-700): insertions consume
    no reference, deletions and N skips split blocks, soft/hard clips are
    ignored, = and X advance like M, and empty CIGAR bytes contribute
    nothing."""

    def ops(*pairs):
        # (len, code) ops packed as the BAM little-endian u32 form
        return bytearray(b"".join(struct.pack("<I", (l << 4) | c) for l, c in pairs))

    M, I, D, N, S, H, EQ, X = 0, 1, 2, 3, 4, 5, 7, 8
    rows = [
        # 5M2I3M: insertion merges into one 8-base block
        ("c1", 100, 0, ops((5, M), (2, I), (3, M)), 60),
        # 5M3D5M: deletion splits the blocks
        ("c2", 100, 0, ops((5, M), (3, D), (5, M)), 60),
        # 5M100N5M: reference skip jumps far
        ("c3", 100, 0, ops((5, M), (100, N), (5, M)), 60),
        # 3S10M2S5H: clips consume no reference
        ("c4", 100, 0, ops((3, S), (10, M), (2, S), (5, H)), 60),
        # 3=2X5M: sequence-match/mismatch codes advance like M
        ("c5", 100, 0, ops((3, EQ), (2, X), (5, M)), 60),
        # empty CIGAR bytes: the read is skipped entirely
        ("c6", 100, 0, bytearray(b""), 60),
    ]
    got = blocks_of(depth(aln(spark, rows)))
    assert got == [
        ("c1", 100, 107, 1),
        ("c2", 100, 104, 1),
        ("c2", 108, 112, 1),
        ("c3", 100, 104, 1),
        ("c3", 205, 209, 1),
        ("c4", 100, 109, 1),
        ("c5", 100, 109, 1),
    ]


def test_depth_skips_null_chrom_and_star_cigar(spark):
    """events.rs test_null_chroms_skipped + test_star_cigar_skipped: rows
    with a null chrom/start never produce blocks, and the '*' unavailable
    CIGAR contributes zero segments."""
    from datafusion_bio_functions_spark.operators.pileup import depth

    df = spark.createDataFrame(
        [
            ("chr1", 100, 0, "5M", 60),
            ("chr1", 102, 0, "*", 60),   # unavailable CIGAR
            (None, 100, 0, "5M", 60),    # null chrom
            ("chr1", None, 0, "5M", 60), # null start
        ],
        "chrom string, start long, flags int, cigar string, mapping_quality int",
    )
    got = [tuple(r) for r in depth(df).collect()]
    assert got == [("chr1", 100, 104, 1)]
    # binary-CIGAR arm applies the same skip
    import struct

    bin_5m = struct.pack("<I", (5 << 4) | 0)  # 5M
    dfb = spark.createDataFrame(
        [("chr1", 100, 0, bin_5m, 60), (None, 100, 0, bin_5m, 60)],
        "chrom string, start long, flags int, cigar binary, mapping_quality int",
    )
    assert [tuple(r) for r in depth(dfb).collect()] == [("chr1", 100, 104, 1)]


def test_depth_dense_bounds_clip(spark):
    """cigar.rs test_dense_bounds_check: dense per-base output clips to the
    declared contig length — a read running past it writes only in-bounds
    positions, in both coordinate modes."""
    from datafusion_bio_functions_spark.operators.pileup import depth

    aln = spark.createDataFrame(
        [("chr1", 6, 0, "10M", 60)],
        "chrom string, start long, flags int, cigar string, mapping_quality int",
    )
    lens = spark.createDataFrame([("chr1", 8)], "contig string, length long")
    got = sorted(tuple(r) for r in depth(aln, per_base=True, contig_lengths=lens).collect())
    assert got == [("chr1", p, 1 if p >= 6 else 0) for p in range(1, 9)]
    # 0-based: positions [0..len), read at 0-based start 5 covers 5..7
    aln0 = spark.createDataFrame(
        [("chr1", 5, 0, "10M", 60)],
        "chrom string, start long, flags int, cigar string, mapping_quality int",
    )
    got0 = sorted(tuple(r) for r in depth(aln0, per_base=True, contig_lengths=lens, zero_based=True).collect())
    assert got0 == [("chr1", p, 1 if p >= 5 else 0) for p in range(0, 8)]
    # a block WHOLLY beyond the contig end must not leak zero positions
    # past the bound through the gap arithmetic either
    aln_far = spark.createDataFrame(
        [("chr1", 12, 0, "5M", 60), ("chr1", 2, 0, "2M", 60)],
        "chrom string, start long, flags int, cigar string, mapping_quality int",
    )
    got_far = sorted(tuple(r) for r in depth(aln_far, per_base=True, contig_lengths=lens).collect())
    assert got_far == [("chr1", p, 1 if p in (2, 3) else 0) for p in range(1, 9)]
