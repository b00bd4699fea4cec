"""Round-11 extended-probes edge battery: the reference's shifted-indel /
unknown-allele / repeat-insertion / visibility-window lookup unit tests
(``variant_lookup_exec.rs`` test module) replayed OPERATOR-LEVEL through
``lookup_variants`` on Spark frames, plus the multiallelic-split ×
``allowed_failed`` interaction the unit tests cannot cover."""

from __future__ import annotations

import pytest

VCF_SCHEMA = "chrom string, start long, end long, ref string, alt string"
CACHE_SCHEMA = (
    "chrom string, start long, end long, variation_name string, allele_string string"
)


def _lookup(spark, vcf_rows, cache_rows, **kw):
    from datafusion_bio_functions_spark.operators.vep import lookup_variants

    vcf = spark.createDataFrame(vcf_rows, VCF_SCHEMA)
    cache = spark.createDataFrame(cache_rows, CACHE_SCHEMA)
    return {
        (r.start, r.ref, r.alt, r.variation_name): r.matched
        for r in lookup_variants(vcf, cache, **kw).collect()
    }


def test_unknown_alleles_match_on_exact_shifted_coords_only(spark):
    """compare_existing_variant_allows_unknown_alleles_on_exact_shifted_
    coords_only (variant_lookup_exec.rs:1933-1958): an unknown-allele
    record (no '/' — HGMD/COSMIC ids) matches ONLY when its coordinates
    equal the probe's VEP-normalized (101, 103); the off-by-one row at
    (100, 103) does not."""
    got = _lookup(
        spark,
        [("1", 100, 103, "ACGT", "A")],
        [("1", 101, 103, "rs_exact", "HGMD_MUTATION"),
         ("1", 100, 103, "rs_off", "HGMD_MUTATION")],
    )
    assert got[(100, "ACGT", "A", "rs_exact")] is True
    assert (100, "ACGT", "A", "rs_off") not in got


def test_unknown_insertion_matches_compare_coordinates(spark):
    """compare_existing_variant_uses_compare_coords_for_unknown_insertions
    (rs:1982-2007): VCF ``TTA>TATATATA`` minimizes to ``-/ATATA`` at
    compare coords (119247098, 119247097) — the start>end insertion
    encoding; an unknown-allele record matches those coordinates exactly
    and nothing else."""
    got = _lookup(
        spark,
        [("1", 119247097, 119247099, "TTA", "TATATATA")],
        [("1", 119247098, 119247097, "rs_cmp", "HGMD_MUTATION"),
         ("1", 119247098, 119247099, "rs_par", "HGMD_MUTATION")],
    )
    assert got[(119247097, "TTA", "TATATATA", "rs_cmp")] is True
    assert (119247097, "TTA", "TATATATA", "rs_par") not in got


def test_repeat_insertion_matches_minimized_compare_space(spark):
    """compare_existing_variant_uses_minimized_compare_allele_space_for_
    repeat_insertions (rs:2196-2226): the repeat-expansion probe's
    minimized ``-/ATATA`` picks the matching component out of a
    multi-allele existing record ``-/A/ATA/ATATA/ATATATA``."""
    got = _lookup(
        spark,
        [("1", 119247097, 119247099, "TTA", "TATATATA")],
        [("1", 119247098, 119247097, "rs_rep", "-/A/ATA/ATATA/ATATATA")],
    )
    assert got[(119247097, "TTA", "TATATATA", "rs_rep")] is True


def test_existing_start_visibility_window(spark):
    """existing_start_visibility_matches_variation_tabix_query_window
    (rs:2347-2396): with extended_probes, a candidate is exposed only
    when its START lies in ``[compare_start-1, compare_end+1]``.
    Deletion probe ``CAACAACAAAAAA>CAAAA`` → compare (27971602,
    27971609): starts 27971601 and 27971610 are visible, 27971600 is
    NOT — even though a long existing variant starting there would
    still OVERLAP the probe span.  Insertion probe ``A>ATT`` → compare
    (101, 100): starts 100 and 101 visible, 99 not."""
    # deletion probe TAAG>T at 100 → VEP-normalized del AAG at (101, 103),
    # visibility window [100, 104].  BOTH anchored cache rows minimize to
    # the identical deletion (Ensembl coordinate-keyed matcher accepts
    # both — verified directly against match_alleles_ensembl), but only
    # the one STARTING inside the window is exposed.
    got = _lookup(
        spark,
        [("1", 100, 103, "TAAG", "T")],
        [
            ("1", 100, 103, "rs_lo_edge", "CAAG/C"),
            ("1", 99, 103, "rs_before", "TCAAG/TC"),
        ],
        extended_probes=True,
    )
    assert got[(100, "TAAG", "T", "rs_lo_edge")] is True
    assert (100, "TAAG", "T", "rs_before") not in got

    # insertion probe A>ATT at 100 → compare (101, 100), window [100, 101]
    got = _lookup(
        spark,
        [("1", 100, 100, "A", "ATT")],
        [
            ("1", 101, 100, "rs_ins", "-/TT"),
            ("1", 100, 100, "rs_at_anchor", "A/ATT"),
            ("1", 99, 100, "rs_out", "GA/GATT"),
        ],
        extended_probes=True,
    )
    assert got[(100, "A", "ATT", "rs_ins")] is True
    assert got[(100, "A", "ATT", "rs_at_anchor")] is True
    assert (100, "A", "ATT", "rs_out") not in got


def test_multiallelic_split_lookup_with_failed_filter(spark, tmp_path):
    """Multiallelic-split inputs through the QC filter: read_vcf
    (split_multiallelic=True) fans ``A,T`` into two probe rows; each
    split allele matches its own cache record independently, and
    ``allowed_failed`` drops QC-failed cache rows BEFORE matching
    (filter_variation(), variant_lookup_exec.rs:1213-1222)."""
    from datafusion_bio_functions_spark.operators.vep import lookup_variants
    from datafusion_bio_functions_spark.sources.readers import read_vcf

    p = tmp_path / "ma.vcf"
    p.write_text(
        "##fileformat=VCFv4.2\n#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n"
        "1\t500\t.\tG\tA,T\t.\t.\t.\n"
    )
    vcf = read_vcf(spark, str(p), split_multiallelic=True)
    assert vcf.count() == 2
    cache = spark.createDataFrame(
        [("1", 500, 500, "rs_A", "G/A", 0),
         ("1", 500, 500, "rs_T", "G/T", 1)],
        CACHE_SCHEMA + ", failed int",
    )
    strict0 = {
        (r.alt, r.variation_name): r.matched
        for r in lookup_variants(vcf, cache).collect()
    }
    # default allowed_failed=0: the failed=1 record is filtered out, so
    # the T split row comes back unmatched
    assert strict0[("A", "rs_A")] is True
    assert ("T", "rs_T") not in strict0
    assert strict0[("T", None)] is False
    tol1 = {
        (r.alt, r.variation_name): r.matched
        for r in lookup_variants(vcf, cache, allowed_failed=1).collect()
    }
    assert tol1[("A", "rs_A")] is True and tol1[("T", "rs_T")] is True
