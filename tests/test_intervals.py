"""Interval algebra correctness vs the DuckDB oracle formulations.

Ports the shape of the reference's integration suite
(``bio-function-ranges/tests/integration_test.rs``): happy paths, strict vs
weak boundary semantics, point-interval containment, empty inputs, one-sided
contigs, extra-column preservation, partition-count invariance, and
algorithm interchangeability (binned / sql / broadcast).
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

import datafusion_bio_functions_spark as bio
from datafusion_bio_functions_spark.plans import oracle as osql
from tests.conftest import COLS, assert_frames_match


@pytest.mark.parametrize("algorithm", ["binned", "sql", "broadcast"])
@pytest.mark.parametrize("filter_op", ["weak", "strict"])
def test_overlap_join_matches_oracle(spark, reads, targets, oracle, algorithm, filter_op):
    got = bio.overlap(reads, targets, filter_op=filter_op, algorithm=algorithm)
    want = oracle.sql(
        osql.overlap_sql("SELECT * FROM reads", "SELECT * FROM targets", filter_op=filter_op)
    )
    assert_frames_match(got, want)


def test_overlap_point_interval_containment(spark, reads, targets):
    # chr1 22000-22300 (read) contains the point target 22100-22100
    got = (
        bio.overlap(reads, targets)
        .filter((F.col("right_pos_start") == 22100) & (F.col("right_pos_end") == 22100))
        .collect()
    )
    assert len(got) == 1
    assert got[0]["left_pos_start"] == 22000


def test_overlap_strict_drops_touching(spark):
    # adjacent closed intervals share exactly one base: weak keeps, strict drops
    l = spark.createDataFrame([("chr1", 100, 200)], COLS)
    r = spark.createDataFrame([("chr1", 200, 300)], COLS)
    assert bio.overlap(l, r, filter_op="weak").count() == 1
    assert bio.overlap(l, r, filter_op="strict").count() == 0


def test_overlap_output_modes(spark, reads, targets):
    join_n = bio.overlap(reads, targets, output="join").count()
    left_all = bio.overlap(reads, targets, output="left_all")
    assert left_all.columns == reads.columns
    assert left_all.count() == join_n
    # 'left'/'left_distinct' is the reference's row-level RIGHT SEMI: each
    # left ROW with >= 1 match emitted exactly once (duplicates preserved)
    left_distinct = bio.overlap(reads, targets, output="left_distinct")
    assert left_distinct.count() <= reads.count()
    assert sorted(map(tuple, left_distinct.collect())) == sorted(
        map(tuple, bio.overlap(reads, targets, output="left").collect())
    )


def test_overlap_empty_input(spark, targets):
    empty = spark.createDataFrame([], "contig string, pos_start long, pos_end long")
    assert bio.overlap(empty, targets).count() == 0
    assert bio.count_overlaps(empty, targets).agg(F.sum("count")).collect()[0][0] == 0


@pytest.mark.parametrize("algorithm", ["join", "broadcast"])
def test_count_overlaps_matches_oracle(spark, reads, targets, oracle, algorithm):
    got = bio.count_overlaps(reads, targets, algorithm=algorithm)
    want = oracle.sql(
        osql.count_overlaps_sql("SELECT * FROM reads", "SELECT * FROM targets")
    )
    assert_frames_match(got, want)


@pytest.mark.parametrize("algorithm", ["join", "broadcast"])
def test_coverage_matches_oracle(spark, reads, targets, oracle, algorithm):
    got = bio.coverage(reads, targets, algorithm=algorithm)
    want = oracle.sql(osql.coverage_sql("SELECT * FROM reads", "SELECT * FROM targets"))
    assert_frames_match(got, want)


def test_auto_bin_width_memoized_one_job(spark, reads, targets, monkeypatch):
    """Plan-shapes guarantee (VERDICT r3 #6): constructing the same overlap
    join twice runs the bin-width stats job AT MOST once — the semantic-plan
    memo answers the second construction without any driver job."""
    from datafusion_bio_functions_spark.operators import intervals as iv

    iv._BIN_WIDTH_MEMO.clear()
    calls = {"n": 0}
    orig = pd.DataFrame  # noqa: F841 — keep pandas import used

    from pyspark.sql import DataFrame as SparkDF

    real_collect = SparkDF.collect

    def counting_collect(self):
        calls["n"] += 1
        return real_collect(self)

    monkeypatch.setattr(SparkDF, "collect", counting_collect)
    bio.overlap(reads, targets)  # construction only — no action
    first = calls["n"]
    bio.overlap(reads, targets)
    second = calls["n"] - first
    assert first <= 1, f"construction ran {first} driver jobs"
    assert second == 0, "second construction must hit the bin-width memo"


@pytest.mark.parametrize("filter_op", ["weak", "strict"])
def test_count_cover_broadcast_point_boundaries(spark, filter_op):
    """Degenerate point intervals + point queries at shared coordinates:
    the strict-mode searchsorted subtraction identity wrongly subtracts
    point intervals at exactly the query position unless corrected (found
    by the r4 gate on count_overlaps_strict) — broadcast must equal the
    join plan row-for-row on this adversarial geometry."""
    left = spark.createDataFrame(
        [("chr1", 10, 10), ("chr1", 10, 10), ("chr1", 5, 15), ("chr1", 10, 20),
         ("chr1", 1, 9), ("chr1", 11, 11), ("chr2", 3, 3)], COLS)
    right = spark.createDataFrame(
        [("chr1", 10, 10), ("chr1", 11, 11), ("chr1", 9, 11), ("chr1", 2, 2),
         ("chr1", 10, 11), ("chr2", 3, 3), ("chr3", 1, 5)], COLS)
    for op in (bio.count_overlaps, bio.coverage):
        a = sorted(map(tuple, op(left, right, filter_op=filter_op,
                                 algorithm="broadcast").collect()))
        b = sorted(map(tuple, op(left, right, filter_op=filter_op,
                                 algorithm="join").collect()))
        assert a == b, f"{op.__name__} broadcast != join under {filter_op}"


def test_coverage_merges_left_first(spark):
    # two identical reads over one target: coverage counts bases once;
    # the reference contribution for an interval inside the probe is
    # min(qe+1, ie) - max(qs-1, is) = ie - is = 50 (interval_tree.rs:148)
    l = spark.createDataFrame([("chr1", 100, 150), ("chr1", 100, 150)], COLS)
    r = spark.createDataFrame([("chr1", 90, 200)], COLS)
    row = bio.coverage(l, r).collect()[0]
    assert row["coverage"] == 50


@pytest.mark.parametrize("min_dist", [0, 2, 100])
@pytest.mark.parametrize("filter_op", ["weak", "strict"])
def test_merge_matches_oracle(spark, merge_input, oracle, min_dist, filter_op):
    got = bio.merge(merge_input, min_dist=min_dist, filter_op=filter_op)
    want = oracle.sql(
        osql.merge_sql("SELECT * FROM merge_input", min_dist=min_dist, filter_op=filter_op)
    )
    assert_frames_match(got, want)


def test_merge_touching_weak_vs_strict(spark):
    df = spark.createDataFrame([("chr1", 1, 5), ("chr1", 5, 10)], COLS)
    assert bio.merge(df, filter_op="weak").count() == 1  # share base 5 → merge
    # strict: s < prev_end + 0 → 5 < 5 false → separate
    assert bio.merge(df, filter_op="strict").count() == 2
    adj = spark.createDataFrame([("chr1", 1, 5), ("chr1", 6, 10)], COLS)
    assert bio.merge(adj, filter_op="weak").count() == 2  # adjacent, no shared base
    assert bio.merge(adj, min_dist=1, filter_op="weak").count() == 1


@pytest.mark.parametrize("min_dist", [0, 10])
def test_cluster_matches_oracle(spark, merge_input, oracle, min_dist):
    got = bio.cluster(merge_input, min_dist=min_dist)
    want = oracle.sql(
        osql.cluster_sql(
            "SELECT * FROM merge_input", all_cols=COLS, min_dist=min_dist
        )
    )
    assert_frames_match(got, want)


def test_cluster_preserves_extra_columns(spark):
    df = spark.createDataFrame(
        [("chr1", 100, 200, "a"), ("chr1", 150, 250, "b"), ("chr1", 500, 600, "c")],
        COLS + ["tag"],
    )
    out = bio.cluster(df).orderBy("pos_start").collect()
    assert [r["tag"] for r in out] == ["a", "b", "c"]
    assert out[0]["cluster"] == out[1]["cluster"] != out[2]["cluster"]
    assert out[0]["cluster_start"] == 100 and out[0]["cluster_end"] == 250


def test_complement_with_view_matches_oracle(spark, merge_input, oracle):
    view_rows = [("chr1", 1, 50000), ("chr2", 1, 1000), ("chr3", 1, 1000), ("chrM", 1, 16000)]
    view = spark.createDataFrame(view_rows, COLS)
    oracle.register("chromsizes", pd.DataFrame(view_rows, columns=COLS))
    got = bio.complement(merge_input, view=view)
    want = oracle.sql(
        osql.complement_sql("SELECT * FROM merge_input", view="SELECT * FROM chromsizes")
    )
    assert_frames_match(got, want)
    # chrM appears only in the view → emitted whole
    assert got.filter("contig = 'chrM'").collect()[0]["pos_end"] == 16000


def test_complement_default_view_bounds(spark):
    df = spark.createDataFrame([("chr1", 100, 200)], COLS)
    out = bio.complement(df).orderBy("pos_start").collect()
    # reference default bounds (0, i64::MAX) per observed contig, with
    # END-EXCLUSIVE gap arithmetic (test_complement_udtf_basic_no_view:
    # (100,200)+(300,400) complement to (0,100),(200,300),(400,MAX))
    assert (out[0]["pos_start"], out[0]["pos_end"]) == (0, 100)
    assert (out[1]["pos_start"], out[1]["pos_end"]) == (200, 9223372036854775807)


def test_subtract_matches_oracle(spark, reads, targets, oracle):
    got = bio.subtract(reads, targets)
    want = oracle.sql(osql.subtract_sql("SELECT * FROM reads", "SELECT * FROM targets"))
    assert_frames_match(got, want)


def test_subtract_fragments_and_preserves_columns(spark):
    """End-exclusive fragment arithmetic, the reference sweep
    (subtract.rs:414-438; integration test_subtract_udtf_basic expects
    (100,400)−(200,300) = (100,200)+(300,400))."""
    l = spark.createDataFrame([("chr1", 100, 300, "x")], COLS + ["tag"])
    r = spark.createDataFrame([("chr1", 150, 160), ("chr1", 200, 250)], COLS)
    out = bio.subtract(l, r).orderBy("pos_start").collect()
    assert [(o["pos_start"], o["pos_end"], o["tag"]) for o in out] == [
        (100, 150, "x"),
        (160, 200, "x"),
        (250, 300, "x"),
    ]
    # right interval swallowing the left entirely → no fragments
    r2 = spark.createDataFrame([("chr1", 50, 400)], COLS)
    assert bio.subtract(l, r2).count() == 0
    # no overlap → left row unchanged
    r3 = spark.createDataFrame([("chr2", 50, 400)], COLS)
    assert bio.subtract(l, r3).collect()[0]["pos_end"] == 300


@pytest.mark.parametrize("filter_op", ["weak", "strict"])
def test_subtract_broadcast_matches_join(spark, filter_op):
    """The CollectRight sweep must equal the join+window plan row-for-row:
    duplicate left rows fragment independently, extra columns ride along,
    degenerate (ls >= le) rows emit nothing, touching rights stay split
    under strict merge, and one-sided contigs pass through."""
    left = spark.createDataFrame(
        [("chr1", 100, 400, "a"), ("chr1", 100, 400, "a"), ("chr1", 250, 250, "pt"),
         ("chr1", 500, 400, "inverted"), ("chr2", 1, 50, "b"), ("chr3", 5, 9, "c")],
        "contig string, pos_start long, pos_end long, tag string")
    right = spark.createDataFrame(
        [("chr1", 200, 300), ("chr1", 300, 350), ("chr1", 380, 600),
         ("chr2", 10, 20), ("chr2", 30, 30)], COLS)
    a = sorted(map(tuple, bio.subtract(left, right, filter_op=filter_op,
                                       algorithm="broadcast").collect()))
    b = sorted(map(tuple, bio.subtract(left, right, filter_op=filter_op,
                                       algorithm="join").collect()))
    assert a == b


def test_subtract_boundary_weak_vs_strict(spark):
    """Reference test_subtract_udtf_strict_boundary: a right starting at
    the left's end leaves the left unchanged in BOTH modes — weakly the
    boundary point joins but the end-exclusive gap math removes nothing."""
    l = spark.createDataFrame([("a", 100, 300)], COLS)
    r = spark.createDataFrame([("a", 300, 400)], COLS)
    assert sorted(map(tuple, bio.subtract(l, r).collect())) == [("a", 100, 300)]
    assert sorted(map(tuple, bio.subtract(l, r, filter_op="strict").collect())) == [
        ("a", 100, 300)
    ]
    # interior case from test_subtract_udtf_basic
    l2 = spark.createDataFrame([("a", 100, 400)], COLS)
    r2 = spark.createDataFrame([("a", 200, 300)], COLS)
    assert sorted(map(tuple, bio.subtract(l2, r2).collect())) == [
        ("a", 100, 200),
        ("a", 300, 400),
    ]


@pytest.mark.parametrize("k", [1, 2, 3])
def test_nearest_matches_oracle(spark, reads, targets, oracle, k):
    got = bio.nearest(reads, targets, k=k)
    want = oracle.sql(
        osql.nearest_sql("SELECT * FROM reads", "SELECT * FROM targets", k=k)
    )
    assert_frames_match(got, want)


def test_nearest_no_candidate_contig(spark, reads):
    r = spark.createDataFrame([("chrZ", 100, 200)], COLS)
    out = bio.nearest(reads, r).collect()
    assert len(out) == 1
    assert out[0]["left_contig"] is None and out[0]["distance"] is None


def test_nearest_distance_semantics(spark):
    l = spark.createDataFrame([("chr1", 100, 200), ("chr1", 500, 600)], COLS)
    r = spark.createDataFrame(
        [("chr1", 150, 180), ("chr1", 300, 310), ("chr1", 450, 460)], COLS
    )
    out = {
        (row["right_pos_start"]): (row["left_pos_start"], row["distance"])
        for row in bio.nearest(l, r).collect()
    }
    assert out[150] == (100, 0)  # overlap → distance 0
    assert out[300] == (100, 100)  # 300 - 200 (closer than 500 - 310 = 190)
    assert out[450] == (500, 40)  # 500 - 460 < 450 - 200


def test_nearest_tie_break(spark):
    # equidistant left intervals: tie-break by (start, end)
    l = spark.createDataFrame([("chr1", 300, 310), ("chr1", 90, 100)], COLS)
    r = spark.createDataFrame([("chr1", 200, 200)], COLS)
    row = bio.nearest(l, r).collect()[0]
    assert row["distance"] == 100
    assert row["left_pos_start"] == 90  # smaller start wins the tie


def test_nearest_exclude_overlaps(spark):
    l = spark.createDataFrame([("chr1", 100, 200), ("chr1", 400, 500)], COLS)
    r = spark.createDataFrame([("chr1", 150, 180)], COLS)
    row = bio.nearest(l, r, include_overlaps=False).collect()[0]
    assert row["left_pos_start"] == 400 and row["distance"] == 220


def test_partition_invariance(spark, merge_input, reads, targets):
    """Mirror of the reference's partition-count invariance tests
    (integration_test.rs:3709-3758): results identical across partitionings."""

    def canon(df):
        return sorted(tuple(r) for r in df.collect())

    for n in (1, 4, 16):
        assert canon(bio.merge(merge_input.repartition(n))) == canon(bio.merge(merge_input))
        assert canon(
            bio.overlap(reads.repartition(n), targets.repartition(max(1, n // 2)))
        ) == canon(bio.overlap(reads, targets))
        assert canon(bio.count_overlaps(reads.repartition(n), targets)) == canon(
            bio.count_overlaps(reads, targets)
        )


def test_interval_join_left_outer(spark, reads, targets):
    out = bio.interval_join(reads, targets, how="left")
    # every read appears; unmatched reads carry NULL right columns
    assert out.count() >= reads.count()
    unmatched = out.filter(F.col("right_contig").isNull())
    assert unmatched.count() == 1  # chr3 234-300 misses target chr3 100-200
    assert unmatched.collect()[0]["left_pos_start"] == 234


def test_binned_join_long_interval_fallback(spark, targets):
    # one interval far longer than long_interval_factor * bin_width
    l = spark.createDataFrame([("chr1", 1, 5_000_000), ("chr1", 150, 250)], COLS)
    got = bio.interval_join(l, targets, algorithm="binned", bin_width=100, long_interval_factor=4)
    want = bio.interval_join(l, targets, algorithm="sql")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_custom_column_names(spark):
    l = spark.createDataFrame([("chr1", 100, 200)], ["chrom", "s", "e"])
    r = spark.createDataFrame([("chr1", 150, 250)], ["c", "b", "f"])
    out = bio.interval_join(l, r, cols_left=("chrom", "s", "e"), cols_right=("c", "b", "f"))
    assert out.count() == 1
    assert set(out.columns) == {"left_chrom", "left_s", "left_e", "right_c", "right_b", "right_f"}

def test_merge_chunked_equals_window(spark):
    """The chunked (100 TB) merge path must produce exactly the window
    path's result — including long intervals bridging many chunks, min_dist
    gaps, and strict/weak boundary semantics."""
    import random as _r

    rnd = _r.Random(7)
    rows = []
    for contig in ("chr1", "chr2"):
        for _ in range(400):
            s = rnd.randrange(1, 100_000)
            ln = rnd.choice([rnd.randrange(1, 50), rnd.randrange(1, 30_000)])
            rows.append((contig, s, s + ln))
    # exact chunk-edge touchers
    rows += [("chr1", 9_999, 10_000), ("chr1", 10_000, 10_001), ("chr1", 20_000, 20_000)]
    df = spark.createDataFrame(rows, "contig string, pos_start long, pos_end long")

    def canon(out):
        return sorted((r.contig, r.pos_start, r.pos_end, r.n_intervals) for r in out.collect())

    for fo in ("weak", "strict"):
        for md in (0, 100):
            want = canon(bio.merge(df, min_dist=md, filter_op=fo))
            got = canon(
                bio.merge(df, min_dist=md, filter_op=fo, algorithm="chunked", chunk_width=10_000)
            )
            assert got == want, (fo, md)
    with pytest.raises(ValueError):
        bio.merge(df, algorithm="quantum")


def test_cluster_chunked_equals_window(spark):
    """The chunked (100 TB) cluster path — merge(chunked) extents + two-level
    global ids + binned point-assignment join — must reproduce the window
    path exactly: same ids, same extents, every row preserved."""
    import random as _r

    rnd = _r.Random(11)
    rows = []
    for contig in ("chr1", "chr2", "chr3"):
        for _ in range(300):
            s = rnd.randrange(1, 80_000)
            ln = rnd.choice([rnd.randrange(1, 40), rnd.randrange(1, 25_000)])
            rows.append((contig, s, s + ln, f"x{rnd.randrange(5)}"))
    rows += [("chr1", 9_999, 10_000, "edge"), ("chr1", 10_000, 10_001, "edge")]
    df = spark.createDataFrame(
        rows, "contig string, pos_start long, pos_end long, tag string"
    )

    def canon(out):
        return sorted(
            (r.contig, r.pos_start, r.pos_end, r.tag, r.cluster, r.cluster_start, r.cluster_end)
            for r in out.collect()
        )

    for fo in ("weak", "strict"):
        for md in (0, 50):
            want = canon(bio.cluster(df, min_dist=md, filter_op=fo))
            got = canon(
                bio.cluster(df, min_dist=md, filter_op=fo, algorithm="chunked", chunk_width=10_000)
            )
            assert got == want, (fo, md)
    with pytest.raises(ValueError):
        bio.cluster(df, algorithm="quantum")


def test_nearest_radius_equals_cogroup(spark):
    """The radius (100 TB) nearest path — padded binned join + top-k window
    + exact fallback — must reproduce the cogroup path for k=1/k=3,
    weak/strict, with/without overlaps, including a radius small enough to
    force the fallback for most probes."""
    import random as _r

    rnd = _r.Random(23)
    lrows, rrows = [], []
    for contig in ("chr1", "chr2"):
        for _ in range(150):
            s = rnd.randrange(1, 60_000)
            lrows.append((contig, s, s + rnd.randrange(1, 300), f"L{rnd.randrange(99)}"))
        for _ in range(100):
            s = rnd.randrange(1, 60_000)
            rrows.append((contig, s, s + rnd.randrange(1, 200)))
    # a probe on a contig with no left intervals at all → NULL row
    rrows.append(("chr9", 5, 10))
    l = spark.createDataFrame(lrows, "contig string, pos_start long, pos_end long, name string")
    r = spark.createDataFrame(rrows, "contig string, pos_start long, pos_end long")

    def canon(df):
        return sorted((tuple(row) for row in df.collect()), key=repr)

    for k in (1, 3):
        for fo, ov in (("weak", True), ("strict", True), ("weak", False)):
            want = canon(
                bio.nearest(l, r, k=k, filter_op=fo, include_overlaps=ov,
                            algorithm="cogroup")
            )
            for rad in (100_000, 700):  # 700 forces fallback for sparse probes
                got = canon(
                    bio.nearest(l, r, k=k, filter_op=fo, include_overlaps=ov,
                                algorithm="radius", radius=rad)
                )
                assert got == want, (k, fo, ov, rad)
    with pytest.raises(ValueError):
        bio.nearest(l, r, algorithm="psychic")
    with pytest.raises(ValueError):
        bio.nearest(l, r, algorithm="radius", radius=0)


def test_nearest_session_config(spark, reads, targets):
    """`spark.bio.nearest.algorithm` mirrors the reference's session-level
    algorithm selection (CoitreesNearest via SET bio.interval_join_algorithm,
    README.md:456-469)."""
    want = sorted(map(repr, bio.nearest(reads, targets).collect()))
    try:
        spark.conf.set("spark.bio.nearest.algorithm", "radius")
        spark.conf.set("spark.bio.nearest.radius", "5000")
        got = sorted(map(repr, bio.nearest(reads, targets).collect()))
        assert got == want
        spark.conf.set("spark.bio.nearest.algorithm", "psychic")
        with pytest.raises(ValueError, match="algorithm"):
            bio.nearest(reads, targets)
    finally:
        spark.conf.unset("spark.bio.nearest.algorithm")
        spark.conf.unset("spark.bio.nearest.radius")


def test_complement_subtract_chunked_merge(spark, reads, targets, merge_input):
    """merge_algorithm='chunked' must not change complement/subtract results."""
    def canon(df):
        return sorted(map(repr, df.collect()))

    assert canon(bio.complement(merge_input, merge_algorithm="chunked", chunk_width=10_000)) == canon(
        bio.complement(merge_input)
    )
    assert canon(bio.subtract(reads, targets, merge_algorithm="chunked", chunk_width=10_000)) == canon(
        bio.subtract(reads, targets)
    )


def test_partition_invariance_scale_paths(spark, merge_input, reads, targets):
    """Partition-count invariance for the chunked/radius scale paths."""

    def canon(df):
        return sorted(map(repr, df.collect()))

    base_cl = canon(bio.cluster(merge_input, algorithm="chunked", chunk_width=5_000))
    base_nr = canon(bio.nearest(reads, targets, algorithm="radius", radius=4_000))
    for n in (1, 4, 16):
        assert canon(
            bio.cluster(merge_input.repartition(n), algorithm="chunked", chunk_width=5_000)
        ) == base_cl
        assert canon(
            bio.nearest(reads.repartition(n), targets.repartition(max(1, n // 2)),
                        algorithm="radius", radius=4_000)
        ) == base_nr


def test_nearest_radius_auto_density(spark, reads, targets):
    """radius=None sizes per-contig search radii from left-side density;
    results equal the exact path, probes on left-absent contigs fall back."""
    r_extra = targets.unionByName(
        spark.createDataFrame([("chrUn", 5, 9)], targets.schema)
    )
    want = sorted(map(repr, bio.nearest(reads, r_extra, algorithm="cogroup").collect()))
    got = sorted(map(repr, bio.nearest(reads, r_extra, algorithm="radius").collect()))
    assert got == want
    # 'auto' (the default) now resolves to the shuffle-parallel radius path
    assert sorted(map(repr, bio.nearest(reads, r_extra).collect())) == want


def test_broadcast_guard_falls_back_to_join(spark, reads, targets, monkeypatch):
    """count_overlaps/coverage with algorithm='broadcast' must fall back to
    the shuffle-parallel join plan when the left side exceeds the guard —
    never collect() a data-scale table onto the driver (VERDICT r2 #4)."""
    from datafusion_bio_functions_spark.operators import intervals as iv

    def canon(df):
        return sorted(map(repr, df.collect()))

    want_cnt = canon(bio.count_overlaps(reads, targets, algorithm="join"))
    want_cov = canon(bio.coverage(reads, targets, algorithm="join"))
    # force the guard to report "too big": results must still be correct,
    # via the join plan, and the driver-side Arrow gather must never run
    # (the guard check now lives inside the broadcast builder, which
    # returns None on over-guard)
    monkeypatch.setattr(iv, "_fits_broadcast", lambda df, guard=0: False)
    from pyspark.sql import DataFrame as SparkDF

    gathers = []
    real_topandas = SparkDF.toPandas
    monkeypatch.setattr(
        SparkDF, "toPandas", lambda self: gathers.append(1) or real_topandas(self)
    )
    got_cnt = bio.count_overlaps(reads, targets, algorithm="broadcast")
    got_cov = bio.coverage(reads, targets, algorithm="broadcast")
    assert gathers == []  # over-guard: no driver gather during planning
    monkeypatch.setattr(SparkDF, "toPandas", real_topandas)
    assert canon(got_cnt) == want_cnt
    assert canon(got_cov) == want_cov


def test_fits_broadcast_bounded_probe(spark, reads):
    from datafusion_bio_functions_spark.operators.intervals import _fits_broadcast

    assert _fits_broadcast(reads)  # tiny table fits the default guard
    assert not _fits_broadcast(reads, guard=1)


@pytest.mark.parametrize("how", ["left", "left_semi", "left_anti"])
def test_interval_join_non_inner_binned_equals_sql(spark, reads, targets, how):
    """Non-inner joins ride the binned (contig, bin) shuffle by default; the
    SQL formulation is the semantics oracle."""
    def canon(df):
        return sorted(map(repr, df.collect()))

    got = bio.interval_join(reads, targets, how=how)  # auto → binned
    want = bio.interval_join(reads, targets, how=how, algorithm="sql")
    assert canon(got) == canon(want)
    # left outer: unmatched left rows appear exactly once with NULL rights
    if how == "left":
        n_unmatched = bio.interval_join(
            reads, targets, how="left_anti"
        ).count()
        assert got.filter(F.col("right_contig").isNull()).count() == n_unmatched


def test_nearest_radius_long_intervals_and_chunk_edges(spark):
    """Chunked radius nearest with intervals far longer than the chunk
    width, probes exactly on chunk boundaries, and a fixed radius — all
    must match the exact cogroup path."""
    lrows = [
        ("chr1", 1, 500_000, "span"),       # spans many 20k chunks
        ("chr1", 39_990, 40_010, "edge"),   # straddles a boundary
        ("chr1", 120_000, 120_050, "mid"),
        ("chr2", 5, 10, "tiny"),
    ]
    rrows = [
        ("chr1", 40_000, 40_000),   # exactly on a chunk boundary
        ("chr1", 600_000, 600_100), # beyond every left end
        ("chr1", 119_999, 120_001),
        ("chr2", 100_000, 100_010), # far from the tiny left interval
    ]
    l = spark.createDataFrame(lrows, "contig string, pos_start long, pos_end long, name string")
    r = spark.createDataFrame(rrows, "contig string, pos_start long, pos_end long")

    def canon(df):
        return sorted(map(repr, df.collect()))

    for k in (1, 2):
        want = canon(bio.nearest(l, r, k=k, algorithm="cogroup"))
        for rad in (None, 1000, 10_000_000):
            got = canon(bio.nearest(l, r, k=k, algorithm="radius", radius=rad))
            assert got == want, (k, rad)


def test_sweep_session_config(spark, merge_input):
    """`spark.bio.sweep.algorithm` flips merge/cluster 'auto' to the
    chunked 100 TB path; results are identical; bad values raise."""
    def canon(df):
        return sorted(map(repr, df.collect()))

    want_m = canon(bio.merge(merge_input))
    want_c = canon(bio.cluster(merge_input))
    try:
        spark.conf.set("spark.bio.sweep.algorithm", "chunked")
        assert canon(bio.merge(merge_input)) == want_m
        assert canon(bio.cluster(merge_input)) == want_c
        spark.conf.set("spark.bio.sweep.algorithm", "quantum")
        with pytest.raises(ValueError, match="sweep"):
            bio.merge(merge_input)
    finally:
        spark.conf.unset("spark.bio.sweep.algorithm")


def test_merge_cluster_large_min_dist_no_overflow(spark):
    """min_dist = i64::MAX must mean "merge everything", not an ANSI
    ARITHMETIC_OVERFLOW — the reference saturates the boundary add
    (merge.rs:291, cluster.rs:457; integration tests
    test_{merge,cluster}_udtf_large_min_dist_no_overflow)."""
    big = 9223372036854775807
    df = spark.createDataFrame(
        [("chr1", 100, 200), ("chr1", 5_000_000, 6_000_000), ("chr2", 1, 2)],
        "contig string, pos_start long, pos_end long",
    )
    for algorithm in ("window", "chunked"):
        m = sorted(map(tuple, bio.merge(df, min_dist=big, algorithm=algorithm).collect()))
        assert m == [("chr1", 100, 6_000_000, 2), ("chr2", 1, 2, 1)], algorithm
        c = bio.cluster(df, min_dist=big, algorithm=algorithm)
        got = sorted(map(tuple, c.select("contig", "cluster_start", "cluster_end").distinct().collect()))
        assert got == [("chr1", 100, 6_000_000), ("chr2", 1, 2)], algorithm


def test_custom_column_name_matching_mode_token(spark):
    """A position column literally named 'strict' must parse as a column
    name, not as the trailing filter-op token (reference
    test_overlap_udtf_custom_column_names_can_match_mode_tokens)."""
    from datafusion_bio_functions_spark.sql_surface import bio_sql

    d = spark.createDataFrame([("chr1", 1, 10), ("chr1", 40, 50)],
                              "c string, strict long, e long")
    d.createOrReplaceTempView("modecol_t")
    got = sorted(map(tuple, bio_sql(
        spark, "SELECT * FROM merge('modecol_t', 'c', 'strict', 'e')"
    ).collect()))
    assert got == [("chr1", 1, 10, 1), ("chr1", 40, 50, 1)]


def test_nearest_index_battery_replay(spark):
    """nearest_index.rs in-module battery, replayed through the operator:
    overlaps rank first then nearest fills (distance tie broken toward the
    smaller start — nearest_k_includes_overlaps_then_fills_nearest), and
    include_overlaps=False excludes the overlap entirely
    (nearest_k_non_overlap_excludes_overlapping_candidates)."""
    import datafusion_bio_functions_spark as bio

    probe = spark.createDataFrame(
        [("c", 35, 35)], "contig string, pos_start long, pos_end long"
    )
    cands = spark.createDataFrame(
        [("c", 10, 20), ("c", 30, 40), ("c", 50, 60)],
        "contig string, pos_start long, pos_end long",
    )
    for algo in ("radius", "cogroup"):
        got = sorted(
            (r.distance, r.left_pos_start)
            for r in bio.nearest(cands, probe, k=2, algorithm=algo).collect()
        )
        # overlap (30,40) at distance 0 first; the 15-bp tie between (10,20)
        # and (50,60) resolves to the smaller start
        assert got == [(0, 30), (15, 10)], (algo, got)
        got_no = sorted(
            (r.distance, r.left_pos_start)
            for r in bio.nearest(
                cands, probe, k=2, include_overlaps=False, algorithm=algo
            ).collect()
        )
        assert got_no == [(15, 10), (15, 50)], (algo, got_no)


def test_merge_adjacent_intervals(spark):
    """interval_tree.rs test_merge_intervals_adjacent: touching intervals
    (1,5)+(5,10) merge into (1,10)."""
    import datafusion_bio_functions_spark as bio

    t = spark.createDataFrame(
        [("c", 1, 5), ("c", 5, 10)], "contig string, pos_start long, pos_end long"
    )
    got = [(r.pos_start, r.pos_end) for r in bio.merge(t).collect()]
    assert got == [(1, 10)]
