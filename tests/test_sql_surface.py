"""SQL table-function surface: the reference's UDTF call shapes
(``table_function.rs:59-259``) routed through ``bio_sql``."""

from __future__ import annotations

import pytest

from datafusion_bio_functions_spark import bio_sql, overlap, count_overlaps, merge, nearest
from datafusion_bio_functions_spark.sql_surface import BioSqlError


@pytest.fixture(scope="module", autouse=True)
def views(spark, reads, targets, merge_input):
    reads.createOrReplaceTempView("reads")
    targets.createOrReplaceTempView("targets")
    merge_input.createOrReplaceTempView("intervals")
    yield


def _sorted(df):
    # key=repr: rows may contain NULLs (nearest emits NULL left columns)
    return sorted((tuple(r) for r in df.collect()), key=repr)


def test_overlap_default(spark, reads, targets):
    got = bio_sql(spark, "SELECT * FROM overlap('reads', 'targets')")
    assert _sorted(got) == _sorted(overlap(reads, targets))


def test_overlap_strict_and_mode(spark, reads, targets):
    got = bio_sql(spark, "SELECT * FROM overlap('reads', 'targets', 'left_all', 'strict')")
    want = overlap(reads, targets, filter_op="strict", output="left_all")
    assert _sorted(got) == _sorted(want)


def test_overlap_custom_cols(spark, reads, targets):
    r2 = reads.toDF("c", "s", "e")
    r2.createOrReplaceTempView("reads_c")
    got = bio_sql(spark, "SELECT * FROM overlap('reads_c', 'targets', 'c', 's', 'e', "
                         "'contig', 'pos_start', 'pos_end')")
    want = overlap(r2, spark.table("targets"), cols_left=("c", "s", "e"))
    assert _sorted(got) == _sorted(want)


def test_count_overlaps_composes_with_sql(spark, reads, targets):
    got = bio_sql(
        spark,
        "SELECT contig, sum(count) AS total FROM count_overlaps('reads', 'targets') "
        "GROUP BY contig ORDER BY contig",
    )
    want = (
        count_overlaps(reads, targets)
        .groupBy("contig")
        .agg({"count": "sum"})
        .withColumnRenamed("sum(count)", "total")
        .orderBy("contig")
    )
    assert _sorted(got) == _sorted(want)


def test_merge_min_dist(spark, merge_input):
    got = bio_sql(spark, "SELECT * FROM merge('intervals', 10)")
    assert _sorted(got) == _sorted(merge(merge_input, min_dist=10))


def test_nearest_k_and_flags(spark, reads, targets):
    got = bio_sql(spark, "SELECT * FROM nearest('reads', 'targets', 2, false)")
    want = nearest(reads, targets, k=2, include_overlaps=False)
    assert _sorted(got) == _sorted(want)


def test_cluster_complement_subtract_depth_paths(spark):
    # smoke every remaining dispatch arm through SQL
    for q in (
        "SELECT * FROM cluster('intervals')",
        "SELECT * FROM complement('intervals')",
        "SELECT * FROM subtract('reads', 'targets')",
    ):
        assert bio_sql(spark, q).count() > 0


def test_udtf_in_cte(spark, reads, targets):
    got = bio_sql(
        spark,
        "WITH ov AS (SELECT * FROM overlap('reads', 'targets')) "
        "SELECT count(*) AS n FROM ov",
    )
    assert got.collect()[0].n == overlap(reads, targets).count()


def test_string_literal_not_rewritten(spark):
    # 'overlap(' inside a string literal must not be treated as a call
    got = bio_sql(spark, "SELECT 'overlap(x)' AS s")
    assert got.collect()[0].s == "overlap(x)"


def test_backtick_rejected(spark):
    with pytest.raises(BioSqlError, match="backtick"):
        bio_sql(spark, "SELECT * FROM overlap('rea`ds', 'targets')")


def test_non_literal_arg_rejected(spark):
    with pytest.raises(BioSqlError, match="literal"):
        bio_sql(spark, "SELECT * FROM overlap(reads, 'targets')")


def test_bad_col_count_rejected(spark):
    with pytest.raises(BioSqlError, match="0, 3, or 6"):
        bio_sql(spark, "SELECT * FROM overlap('reads', 'targets', 'a', 'b')")


# ---------------------------------------------------------------------------
# annotate_vep UDTF (annotate_table_function.rs:19-132 arg shape)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def vep_views(spark):
    vcf = spark.createDataFrame(
        [("1", 100, 100, "A", "T"), ("1", 200, 200, "G", "C")],
        "chrom string, start long, end long, ref string, alt string",
    )
    cache = spark.createDataFrame(
        [("1", 100, 100, "rs1", "A/T")],
        "chrom string, start long, end long, variation_name string, allele_string string",
    )
    tx = spark.createDataFrame(
        [("ENST1", "1", 90, 150, 1, "protein_coding", "ENSG1", "GENE1")],
        ["transcript_id", "chrom", "start", "end", "strand", "biotype",
         "gene_stable_id", "gene_symbol"],
    )
    vcf.createOrReplaceTempView("sqlvcf")
    cache.createOrReplaceTempView("sqlcache")
    tx.createOrReplaceTempView("sqltx")
    yield


def test_annotate_vep_udtf(spark, vep_views):
    got = bio_sql(spark, "SELECT * FROM annotate_vep('sqlvcf', 'sqlcache')")
    rows = {r["start"]: r for r in got.collect()}
    assert rows[100]["existing_variation"] == "rs1"
    assert "most_severe_consequence" in got.columns


def test_annotate_vep_udtf_options_json(spark, vep_views):
    got = bio_sql(
        spark,
        "SELECT most_severe_consequence AS msc, start FROM annotate_vep("
        "'sqlvcf', 'sqlcache', 'sqltx', '{\"engine\": \"positional\"}') "
        "ORDER BY start",
    )
    assert [r.msc for r in got.collect()] == [
        "coding_transcript_variant", "downstream_gene_variant"]


def test_annotate_vep_udtf_bad_options(spark, vep_views):
    with pytest.raises(BioSqlError, match="unknown options_json keys"):
        bio_sql(spark, "SELECT * FROM annotate_vep('sqlvcf', 'sqlcache', '{\"nope\": 1}')")
    with pytest.raises(BioSqlError, match="not valid JSON"):
        bio_sql(spark, "SELECT * FROM annotate_vep('sqlvcf', 'sqlcache', '{oops')")


def test_lookup_variants_udtf(spark, vep_views):
    got = bio_sql(spark, "SELECT * FROM lookup_variants('sqlvcf', 'sqlcache')")
    rows = {r["start"]: r for r in got.collect()}
    assert rows[100]["variation_name"] == "rs1"
    assert rows[200]["variation_name"] is None


def test_lookup_variants_udtf_columns_csv(spark, vep_views):
    """Reference arg order: 3rd arg = comma-separated column projection
    (table_function.rs:80-96), then match_mode, then extended_probes."""
    got = bio_sql(
        spark,
        "SELECT * FROM lookup_variants('sqlvcf', 'sqlcache', 'variation_name', 'exact', false)",
    )
    assert "variation_name" in got.columns
    rows = {r["start"]: r for r in got.collect()}
    assert rows[100]["variation_name"] == "rs1"


def test_annotate_vep_udtf_context_arms(spark, vep_views):
    # options_json names registered regulatory/structural context tables
    # (the reference resolves the same arms from its partitioned cache
    # layout, annotate_provider.rs:8198-8209)
    spark.createDataFrame(
        [("1", 50, 150, "ENSRX", "promoter")],
        "chrom string, start long, end long, feature_id string, feature_type string",
    ).createOrReplaceTempView("sqlreg")
    spark.createDataFrame(
        [("TXS", "1", 40, 160, 1, "protein_coding", "G", "GN", 60, 140)],
        "transcript_id string, chrom string, start long, end long, strand int, "
        "biotype string, gene_stable_id string, gene_symbol string, "
        "cds_start long, cds_end long",
    ).createOrReplaceTempView("sqltx")
    got = bio_sql(
        spark,
        "SELECT * FROM annotate_vep('sqlvcf', 'sqlcache', 'sqltx', "
        "'{\"regulatory\": \"sqlreg\"}')",
    ).collect()
    joined = ",".join(r.CSQ for r in got if r.CSQ)
    assert "ENSRX" in joined and "regulatory_region_variant" in joined
    import pytest as _pt

    with _pt.raises(BioSqlError, match="table name"):
        bio_sql(
            spark,
            "SELECT * FROM annotate_vep('sqlvcf', 'sqlcache', 'sqltx', "
            "'{\"regulatory\": 5}')",
        )


def test_annotate_vep_udtf_reference_flag_families(spark, vep_views):
    """The reference parses transcript-selection / HGVS / colocated flag
    families from the SAME top-level options_json
    (annotate_provider.rs:1110-1296) — the SQL surface maps them to the
    matching annotate_vep() keyword groups."""
    # af=true implies check_existing (VEP implication) → rs1 renders
    got = bio_sql(
        spark,
        "SELECT start, existing_variation AS ev FROM annotate_vep("
        "'sqlvcf', 'sqlcache', 'sqltx', '{\"af\": true}') ORDER BY start",
    )
    assert [r.ev for r in got.collect()] == ["rs1", ""]
    # raw reference defaults (no flags) empty the colocated block: the
    # presence of ANY vep-flag key switches off the permissive default
    got = bio_sql(
        spark,
        "SELECT start, existing_variation AS ev FROM annotate_vep("
        "'sqlvcf', 'sqlcache', 'sqltx', '{\"check_existing\": false}') "
        "ORDER BY start",
    )
    assert [r.ev for r in got.collect()] == ["", ""]
    # refseq selection drops the ENST transcript -> both rows intergenic
    got = bio_sql(
        spark,
        "SELECT most_severe_consequence AS msc FROM annotate_vep("
        "'sqlvcf', 'sqlcache', 'sqltx', '{\"refseq\": true}')",
    )
    assert {r.msc for r in got.collect()} == {"intergenic_variant"}
    # invalid combination propagates the reference's error text
    with pytest.raises(Exception, match="mutually exclusive"):
        bio_sql(
            spark,
            "SELECT * FROM annotate_vep('sqlvcf', 'sqlcache', 'sqltx', "
            "'{\"refseq\": true, \"merged\": true}')",
        )


def test_annotate_vep_udtf_distance_option(spark, vep_views):
    """annotate_table_function.rs test_annotate_vep_respects_options_json_
    distance_for_upstream_and_downstream: the options_json 'distance' key
    accepts a non-negative number (both windows) or an 'up,down' pair
    string; invalid values fall back to the 5000/5000 default
    (parse_json_distance_option, annotate_provider.rs:2386-2410)."""
    # far transcript at [9000, 9500]; variant at 100: distance 8900 — inside
    # only when the window is widened beyond the default 5000
    far_tx = spark.createDataFrame(
        [("ENSTFAR", "1", 9000, 9500, 1, "protein_coding", "ENSG9", "GENE9")],
        ["transcript_id", "chrom", "start", "end", "strand", "biotype",
         "gene_stable_id", "gene_symbol"],
    )
    far_tx.createOrReplaceTempView("sqlfartx")

    def msc(opts):
        return bio_sql(
            spark,
            "SELECT most_severe_consequence AS msc FROM annotate_vep("
            f"'sqlvcf', 'sqlcache', 'sqlfartx', '{opts}') WHERE start = 100",
        ).collect()[0].msc

    assert msc('{}') == "intergenic_variant"
    assert msc('{"distance": 10000}') == "upstream_gene_variant"
    assert msc('{"distance": "10000,20000"}') == "upstream_gene_variant"
    # downstream-only widening does not capture an upstream transcript
    assert msc('{"distance": "1000,20000"}') == "intergenic_variant"
    # invalid → default 5000/5000 (reference unwrap_or): non-numeric,
    # negative, fractional (never truncated), boolean
    assert msc('{"distance": "oops"}') == "intergenic_variant"
    assert msc('{"distance": -5}') == "intergenic_variant"
    assert msc('{"distance": 2.9}') == "intergenic_variant"
    assert msc('{"distance": true}') == "intergenic_variant"


def test_annotate_vep_udtf_shift_hgvs_key_accepted(spark, vep_views):
    """options_json 'shift_hgvs' is a recognized HGVS-family key
    (HgvsFlags.from_options_json, annotate_provider.rs:1197-1200)."""
    got = bio_sql(
        spark,
        "SELECT start FROM annotate_vep('sqlvcf', 'sqlcache', 'sqltx', "
        "'{\"hgvs\": true, \"shift_hgvs\": false}')",
    )
    assert got.count() == 2


def test_annotate_vep_udtf_reference_layout_keys(spark, vep_views, tmp_path):
    """The reference's physical-layout options_json keys are tolerated
    no-ops (partitioned/use_fjall/buffer_size — Spark owns those
    decisions), translations_sift_table maps onto the sift= context arm,
    and reference_fasta_path loads the FASTA into the genomic 3'-shift
    state (round 11: previously a targeted rejection; the reference
    REQUIRES the key whenever HGVS output is on)."""
    got = bio_sql(
        spark,
        "SELECT start FROM annotate_vep('sqlvcf', 'sqlcache', "
        "'{\"partitioned\": true, \"use_fjall\": false, \"buffer_size\": 50000}')",
    )
    assert got.count() == 2
    fa = tmp_path / "ref.fa"
    fa.write_text(">1 test contig\n" + "N" * 3000 + "\n")
    got = bio_sql(
        spark,
        "SELECT start FROM annotate_vep('sqlvcf', 'sqlcache', "
        f"'{{\"reference_fasta_path\": \"{fa}\"}}')",
    )
    assert got.count() == 2
    with pytest.raises(BioSqlError, match="unreadable"):
        bio_sql(
            spark,
            "SELECT * FROM annotate_vep('sqlvcf', 'sqlcache', "
            "'{\"reference_fasta_path\": \"/nonexistent/x.fa\"}')",
        )


def test_annotate_vep_udtf_quoted_boolean_families(spark, vep_views):
    """The SQL seam coerces quoted booleans by CONTENT across every flag
    family ('\"everything\": \"0\"' means OFF — naive bool() inverted it)
    and reports bad values as BioSqlError."""
    # quoted "0" everything must NOT enable the 80-field layout: the run
    # succeeds with the default behavior
    got = bio_sql(
        spark,
        "SELECT start FROM annotate_vep('sqlvcf', 'sqlcache', 'sqltx', "
        "'{\"everything\": \"0\"}')",
    )
    assert got.count() == 2
    with pytest.raises(BioSqlError, match="boolean"):
        bio_sql(
            spark,
            "SELECT * FROM annotate_vep('sqlvcf', 'sqlcache', 'sqltx', "
            "'{\"hgvs\": \"maybe\"}')",
        )
