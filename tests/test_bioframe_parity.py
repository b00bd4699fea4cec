"""bioframe parity harness (the reference asserts bioframe-identical
semantics: `integration_test.rs:956-1205`).  bioframe is not installed in
this container, so the harness is import-gated — it arms automatically
wherever `pip install bioframe` has run.

bioframe uses 0-based half-open coordinates; our operators' `strict` mode is
exactly that boundary interpretation, so frames are passed through with
`filter_op='strict'` and end+0 (bioframe `end` exclusive == our strict end).
"""

from __future__ import annotations

import pytest

bioframe = pytest.importorskip("bioframe")

import pandas as pd  # noqa: E402

import datafusion_bio_functions_spark as bio  # noqa: E402

ROWS_L = [
    ("chr1", 1, 50), ("chr1", 40, 100), ("chr1", 200, 300),
    ("chr2", 10, 20), ("chr2", 15, 40),
]
ROWS_R = [
    ("chr1", 45, 60), ("chr1", 90, 250), ("chr2", 5, 16), ("chr3", 1, 10),
]


def _pdf(rows):
    return pd.DataFrame(rows, columns=["chrom", "start", "end"])


def _sdf(spark, rows):
    return spark.createDataFrame(
        rows, "contig string, pos_start long, pos_end long"
    )


def test_overlap_matches_bioframe(spark):
    want = bioframe.overlap(
        _pdf(ROWS_L), _pdf(ROWS_R), how="inner", suffixes=("_1", "_2")
    )
    got = bio.overlap(
        _sdf(spark, ROWS_L), _sdf(spark, ROWS_R), filter_op="strict"
    ).toPandas()
    assert len(got) == len(want)


def test_merge_matches_bioframe(spark):
    want = bioframe.merge(_pdf(ROWS_L))
    got = bio.merge(_sdf(spark, ROWS_L), filter_op="strict").toPandas()
    assert sorted(map(tuple, got[["contig", "pos_start", "pos_end"]].values.tolist())) == sorted(
        map(tuple, want[["chrom", "start", "end"]].values.tolist())
    )


def test_count_overlaps_matches_bioframe(spark):
    want = bioframe.count_overlaps(_pdf(ROWS_R), _pdf(ROWS_L))
    got = bio.count_overlaps(
        _sdf(spark, ROWS_L), _sdf(spark, ROWS_R), filter_op="strict"
    ).toPandas()
    got_map = {
        (r.contig, r.pos_start, r.pos_end): r["count"] for _, r in got.iterrows()
    }
    for _, r in want.iterrows():
        assert got_map[(r["chrom"], r["start"], r["end"])] == r["count"]
