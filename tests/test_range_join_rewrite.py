"""Transparent range-join rewrite parity tests.

Ports the contract of the reference's interval-join predicate parser
(``physical_planner/intervals.rs:220-525``): all 8 comparator arrangements
(each conjunct written left- or right-table-first, in either conjunct
order) are recognized, ``<``/``>`` are normalized by decrementing the end
bound, and anything outside the grammar — arithmetic operands, OR, a bound
set twice, multi-way joins — falls back to the stock Spark plan.  Ground
truth for every accepted query is Spark's own evaluation of the *unrewritten*
statement, so the rewrite is checked to be a pure physical-strategy change.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datafusion_bio_functions_spark.plans import range_join as rj
from datafusion_bio_functions_spark.sql_surface import bio_sql


@pytest.fixture(scope="module", autouse=True)
def _views(spark, reads, targets):
    reads.createOrReplaceTempView("rj_reads")
    targets.createOrReplaceTempView("rj_targets")
    # disjoint-column twin of targets for unqualified-reference tests
    targets.select(
        F.col("contig").alias("t_contig"),
        F.col("pos_start").alias("t_start"),
        F.col("pos_end").alias("t_end"),
    ).createOrReplaceTempView("rj_targets_t")
    yield


def _check(spark, query, expect_rewrite=True):
    plain = sorted(map(tuple, spark.sql(query).collect()))
    got_df = bio_sql(spark, query)
    assert (rj.last_rewrite() is not None) == expect_rewrite, (
        f"rewrite engaged={rj.last_rewrite() is not None}, "
        f"expected {expect_rewrite} for {query!r}"
    )
    got = sorted(map(tuple, got_df.collect()))
    assert got == plain, f"rewrite changed results for {query!r}"
    return got


PROJ = (
    "SELECT a.contig AS contig, a.pos_start AS a_start, a.pos_end AS a_end, "
    "b.pos_start AS b_start, b.pos_end AS b_end "
    "FROM rj_reads a JOIN rj_targets b ON "
)

# the 8 arrangements: conjunct-1 {ls<=re | re>=ls} x conjunct-2
# {le>=rs | rs<=le} x conjunct order
ARRANGEMENTS = [
    "a.contig = b.contig AND a.pos_start <= b.pos_end AND a.pos_end >= b.pos_start",
    "a.contig = b.contig AND b.pos_end >= a.pos_start AND a.pos_end >= b.pos_start",
    "a.contig = b.contig AND a.pos_start <= b.pos_end AND b.pos_start <= a.pos_end",
    "a.contig = b.contig AND b.pos_end >= a.pos_start AND b.pos_start <= a.pos_end",
    "a.contig = b.contig AND a.pos_end >= b.pos_start AND a.pos_start <= b.pos_end",
    "a.contig = b.contig AND a.pos_end >= b.pos_start AND b.pos_end >= a.pos_start",
    "a.contig = b.contig AND b.pos_start <= a.pos_end AND a.pos_start <= b.pos_end",
    "a.contig = b.contig AND b.pos_start <= a.pos_end AND b.pos_end >= a.pos_start",
]


@pytest.mark.parametrize("cond", ARRANGEMENTS)
def test_all_eight_arrangements(spark, cond):
    rows = _check(spark, PROJ + cond)
    assert rows  # fixture tables do overlap


@pytest.mark.parametrize(
    "cond",
    [
        # strict comparators: minus-one normalization (intervals.rs:63-65)
        "a.contig = b.contig AND a.pos_start < b.pos_end AND a.pos_end >= b.pos_start",
        "a.contig = b.contig AND a.pos_start <= b.pos_end AND a.pos_end > b.pos_start",
        "a.contig = b.contig AND a.pos_start < b.pos_end AND a.pos_end > b.pos_start",
        "a.contig = b.contig AND b.pos_end > a.pos_start AND b.pos_start < a.pos_end",
    ],
)
def test_strict_comparators_minus_one(spark, cond):
    _check(spark, PROJ + cond)
    assert rj.last_rewrite()["minus_one"] != (False, False)


def test_equality_conjunct_position_free(spark):
    _check(
        spark,
        PROJ
        + "a.pos_start <= b.pos_end AND a.contig = b.contig AND a.pos_end >= b.pos_start",
    )
    _check(
        spark,
        PROJ
        + "a.pos_start <= b.pos_end AND a.pos_end >= b.pos_start AND b.contig = a.contig",
    )


def test_pure_range_join_without_equi_key(spark):
    # NestedLoopJoin case: no contig equality — constant-key interval join
    q = (
        "SELECT a.pos_start AS a_start, b.pos_start AS b_start "
        "FROM rj_reads a JOIN rj_targets b "
        "ON a.pos_start <= b.pos_end AND a.pos_end >= b.pos_start"
    )
    _check(spark, q)
    assert rj.last_rewrite()["equi"] is False


def test_where_clause_and_aggregate_survive(spark):
    q = (
        "SELECT a.contig AS contig, count(*) AS n FROM rj_reads a JOIN rj_targets b "
        "ON a.contig = b.contig AND a.pos_start <= b.pos_end AND a.pos_end >= b.pos_start "
        "WHERE a.pos_start > 100 GROUP BY a.contig ORDER BY contig"
    )
    _check(spark, q)


def test_disjoint_columns_unqualified_references(spark):
    q = (
        "SELECT contig, pos_start, t_start "
        "FROM rj_reads JOIN rj_targets_t "
        "ON rj_reads.contig = rj_targets_t.t_contig "
        "AND rj_reads.pos_start <= rj_targets_t.t_end "
        "AND rj_reads.pos_end >= rj_targets_t.t_start"
    )
    _check(spark, q)


@pytest.mark.parametrize(
    "cond",
    [
        # arithmetic operand (complex expr — intervals.rs rejects)
        "a.contig = b.contig AND a.pos_start + 1 <= b.pos_end AND a.pos_end >= b.pos_start",
        # bound set twice
        "a.contig = b.contig AND a.pos_start <= b.pos_end AND a.pos_start <= b.pos_end",
        # same-side comparison
        "a.contig = b.contig AND a.pos_start <= a.pos_end AND a.pos_end >= b.pos_start",
        # only one range conjunct
        "a.contig = b.contig AND a.pos_start <= b.pos_end",
        # two equalities
        "a.contig = b.contig AND a.pos_start = b.pos_start AND a.pos_end >= b.pos_start",
    ],
)
def test_out_of_grammar_falls_back(spark, cond):
    _check(spark, PROJ + cond, expect_rewrite=False)


def test_or_condition_falls_back(spark):
    q = (
        PROJ
        + "a.contig = b.contig AND (a.pos_start <= b.pos_end OR a.pos_end >= b.pos_start)"
    )
    _check(spark, q, expect_rewrite=False)


def test_multiway_join_falls_back(spark):
    q = (
        "SELECT a.contig AS contig FROM rj_reads a "
        "JOIN rj_targets b ON a.contig = b.contig "
        "AND a.pos_start <= b.pos_end AND a.pos_end >= b.pos_start "
        "JOIN rj_targets c ON a.contig = c.contig "
        "AND a.pos_start <= c.pos_end AND a.pos_end >= c.pos_start"
    )
    _check(spark, q, expect_rewrite=False)


@pytest.mark.parametrize(
    "jt,how",
    [
        ("LEFT JOIN", "left"),
        ("LEFT OUTER JOIN", "left"),
        ("LEFT SEMI JOIN", "left_semi"),
        ("LEFT ANTI JOIN", "left_anti"),
        ("ANTI JOIN", "left_anti"),
    ],
)
def test_join_types(spark, jt, how):
    """The reference's IntervalJoinExec join types (Inner/Right/RightSemi/
    RightAnti, interval_join.rs:218-221) in their left-handed SQL
    spellings."""
    cols = (
        "a.contig AS contig, a.pos_start AS a_start"
        if how in ("left_semi", "left_anti")
        else "a.contig AS contig, a.pos_start AS a_start, b.pos_start AS b_start"
    )
    q = (
        f"SELECT {cols} FROM rj_reads a {jt} rj_targets b "
        "ON a.contig = b.contig AND a.pos_start <= b.pos_end "
        "AND a.pos_end >= b.pos_start"
    )
    _check(spark, q)
    assert rj.last_rewrite()["how"] == how


def test_left_join_keeps_unmatched_rows(spark):
    q = (
        "SELECT a.contig AS contig, a.pos_start AS a_start, b.pos_start AS b_start "
        "FROM rj_reads a LEFT JOIN rj_targets b "
        "ON a.contig = b.contig AND a.pos_start <= b.pos_end "
        "AND a.pos_end >= b.pos_start"
    )
    rows = _check(spark, q)
    assert any(r[2] is None for r in rows)  # chr3 read has no target overlap


def test_conf_knob_disables(spark):
    q = PROJ + ARRANGEMENTS[0]
    spark.conf.set(rj.RANGE_JOIN_REWRITE_KEY, "false")
    try:
        _check(spark, q, expect_rewrite=False)
    finally:
        spark.conf.set(rj.RANGE_JOIN_REWRITE_KEY, "true")
    _check(spark, q, expect_rewrite=True)


def test_rewritten_plan_is_binned_not_smj_postfilter(spark):
    """The point of the rewrite: the physical plan must be the (contig, bin)
    equi-join, not a sort-merge join with the range residual as a
    post-filter (quadratic within a contig)."""
    q = PROJ + ARRANGEMENTS[0]
    df = bio_sql(spark, q)
    assert rj.last_rewrite() is not None
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the binned path's fingerprints: a sequence/explode of genome bins
    assert "sequence(" in plan or "explode" in plan.lower()


def test_udtf_and_range_join_compose(spark):
    """A bio UDTF view produced by the same statement participates in the
    range-join rewrite."""
    q = (
        "SELECT m.contig AS contig, m.pos_start AS m_start, r.pos_start AS r_start "
        "FROM merge('rj_reads') m JOIN rj_targets r "
        "ON m.contig = r.contig AND m.pos_start <= r.pos_end "
        "AND m.pos_end >= r.pos_start"
    )
    got_df = bio_sql(spark, q)
    assert rj.last_rewrite() is not None
    # ground truth: DataFrame-level merge + plain overlap condition
    from datafusion_bio_functions_spark.operators.intervals import merge

    m = merge(spark.table("rj_reads"))
    r = spark.table("rj_targets")
    want = sorted(
        map(
            tuple,
            m.alias("m")
            .join(
                r.alias("r"),
                (F.col("m.contig") == F.col("r.contig"))
                & (F.col("m.pos_start") <= F.col("r.pos_end"))
                & (F.col("m.pos_end") >= F.col("r.pos_start")),
            )
            .select(
                F.col("m.contig").alias("contig"),
                F.col("m.pos_start").alias("m_start"),
                F.col("r.pos_start").alias("r_start"),
            )
            .collect(),
        )
    )
    assert sorted(map(tuple, got_df.collect())) == want
