"""Physical-plan shape assertions (mirror of the reference's explain-plan
tests, ``integration_test.rs:3957``): the interval operators must plan as
equi-keyed joins — never cartesian/nested-loop — with column pruning into
the parquet scans."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import datafusion_bio_functions_spark as bio


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def pq(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("plans")
    df = spark.createDataFrame(
        [("chr1", i * 10, i * 10 + 15, i) for i in range(1000)],
        "contig string, pos_start long, pos_end long, payload long",
    )
    df.write.parquet(str(base / "l"))
    df.write.parquet(str(base / "r"))
    return (
        spark.read.parquet(str(base / "l")),
        spark.read.parquet(str(base / "r")),
    )


def test_binned_overlap_is_equi_join(pq):
    l, r = pq
    plan = _plan(bio.overlap(l, r, algorithm="binned"))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # the binned strategy joins on (contig, bin): hash-based equi join
    assert "HashJoin" in plan or "SortMergeJoin" in plan


def test_column_pruning_reaches_scan(pq):
    l, r = pq
    out = bio.overlap(l, r).select("left_contig", "right_pos_start")
    plan = _plan(out)
    # payload is never read from parquet: every ReadSchema omits it
    for chunk in plan.split("ReadSchema: ")[1:]:
        assert "payload" not in chunk.split("\n")[0]


def test_merge_has_no_cartesian_or_smj(pq):
    l, _ = pq
    # default is now the chunked two-phase sweep: its only join is the
    # BROADCAST join against the #buckets summary — never a sort-merge of
    # data-scale rows, never a cartesian
    plan = _plan(bio.merge(l))
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # islands = running max + sum windows (per contig-bucket in phase 1)
    assert "Window" in plan
    # the opt-in window path stays join-free
    wplan = _plan(bio.merge(l, algorithm="window"))
    assert "Join" not in wplan and "Window" in wplan


def test_count_overlaps_no_nested_loop(pq):
    l, r = pq
    plan = _plan(bio.count_overlaps(l, r))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_whole_stage_codegen_active(spark, pq):
    # AQE wraps the plan pre-execution, hiding codegen subtrees from the
    # explain — disable it for the one plan build so spans are visible
    l, _ = pq
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        df = bio.merge(l)
        s = spark._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "codegen")
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    assert "WholeStageCodegen" in s and "Found 0 WholeStageCodegen" not in s


def test_session_algorithm_override(spark, pq):
    from datafusion_bio_functions_spark.session import INTERVAL_JOIN_ALGORITHM_KEY

    l, r = pq
    spark.conf.set(INTERVAL_JOIN_ALGORITHM_KEY, "sql")
    try:
        plan = _plan(bio.overlap(l, r))  # algorithm left at 'auto'
        assert "__lbin" not in plan  # binning disabled by session override
        spark.conf.set(INTERVAL_JOIN_ALGORITHM_KEY, "banana")
        with pytest.raises(ValueError):
            bio.overlap(l, r)
    finally:
        spark.conf.set(INTERVAL_JOIN_ALGORITHM_KEY, "auto")
    # override off again → binned path returns
    assert "__lbin" in str(bio.overlap(l, r)._jdf.queryExecution().analyzed().toString())


def test_cluster_chunked_no_cartesian(pq):
    l, _ = pq
    plan = _plan(bio.cluster(l, algorithm="chunked", chunk_width=1000))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # point-assignment runs through the binned equi join
    assert "HashJoin" in plan or "SortMergeJoin" in plan


def test_nearest_radius_no_cartesian(pq):
    l, r = pq
    plan = _plan(bio.nearest(l, r, algorithm="radius", radius=5000))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # exact fallback rides along as a cogrouped Arrow exchange
    assert "FlatMapCoGroupsInPandas" in plan


def test_depth_chunked_no_join(spark):
    aln = spark.createDataFrame(
        [("chr1", 100 + i, 0, "50M", 60) for i in range(500)],
        "chrom string, start long, flags int, cigar string, mapping_quality int",
    )
    from datafusion_bio_functions_spark.operators.pileup import depth

    plan = _plan(depth(aln, algorithm="chunked", chunk_width=1000))
    assert "CartesianProduct" not in plan


def test_semantic_dedup_no_cartesian(spark, tmp_path_factory):
    """semantic_dedup's pair stage is a grouped GEMM over (cluster,
    block-pair) keys — never a cartesian/nested-loop join — and the
    embedding scan prunes to (id, vector)."""
    from datafusion_bio_functions_spark.operators.similarity import semantic_dedup

    base = tmp_path_factory.mktemp("semded")
    spark.createDataFrame(
        [(i, [float(i % 7), float(i % 5), 1.0], i % 3) for i in range(200)],
        "vec_id long, embedding array<float>, label int",
    ).write.parquet(str(base / "emb"))
    emb = spark.read.parquet(str(base / "emb"))
    pairs = semantic_dedup(emb, threshold=0.99, n_clusters=4, dim=3, output="pairs")
    plan = _plan(pairs)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "FlatMapGroupsInPandas" in plan  # the grouped GEMM stage
    # column pruning: the label column never leaves the scan
    assert "label" not in plan.split("FileScan")[-1].split("ReadSchema:")[-1]


def test_line_dedup_single_generate(spark):
    """line_dedup scans the exploded lines frame ONCE: exactly one Generate
    (posexplode) in the executed plan — round 8 filtered the exploded frame
    twice, running the explode+split over the corpus twice."""
    from datafusion_bio_functions_spark.operators.dedup import line_dedup

    docs = spark.createDataFrame(
        [(i, "a b c\nd e f\na b c") for i in range(50)], "doc_id long, text string"
    )
    plan = _plan(line_dedup(docs))
    assert plan.count("Generate") == 1, plan
    assert "CartesianProduct" not in plan
