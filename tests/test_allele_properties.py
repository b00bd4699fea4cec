"""Property tests for the allele normalization family (V5-V9) — pure Python
functions under the registered UDFs, so hypothesis can run thousands of cases
without Spark jobs.  Laws derived from the reference semantics
(`allele.rs:32-189` trim, `:283-369` VEP conversion, `:391-548` matching)."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from datafusion_bio_functions_spark.functions.alleles import (
    allele_matches,
    allele_matches_relaxed,
    trim_sequences_ensembl,
    vcf_to_vep_allele,
    vep_allele_string,
    vep_norm_end,
    vep_norm_start,
)

base = st.sampled_from("ACGT")
seq = st.text(alphabet="ACGT", min_size=1, max_size=8)
maybe_empty_seq = st.text(alphabet="ACGT", min_size=0, max_size=8)

SET = settings(max_examples=300, deadline=None)


@given(ref=seq, alt=seq)
@SET
def test_trim_removes_all_shared_affixes(ref, alt):
    r, a, start, end, changed = trim_sequences_ensembl(ref, alt, 100)
    rr = "" if r == "-" else r
    aa = "" if a == "-" else a
    # nothing shared remains at either boundary
    assert not (rr and aa and rr[0] == aa[0])
    assert not (rr and aa and rr[-1] == aa[-1])
    # trimmed alleles are substrings at consistent offsets
    assert rr in ref and aa in alt
    # coordinates stay consistent with the remaining ref length
    assert end - start + 1 == len(rr) or (not rr and end < start + max(1, len(ref)))
    assert changed == (len(rr) < len(ref) or len(aa) < len(alt))


@given(ref=seq, alt=seq)
@SET
def test_trim_prefix_suffix_order_identical_when_unambiguous(ref, alt):
    """When ref/alt share no full overlap ambiguity the two orders agree on
    the remaining alleles (they may differ on coordinates only when the
    whole allele collapses)."""
    r1, a1, *_ = trim_sequences_ensembl(ref, alt, 100, end_first=False)
    r2, a2, *_ = trim_sequences_ensembl(ref, alt, 100, end_first=True)
    if r1 != "-" and a1 != "-" and r2 != "-" and a2 != "-":
        assert len(r1) + len(a1) == len(r2) + len(a2)


@given(ref=seq, alt=seq)
@SET
def test_vep_allele_matches_own_string(ref, alt):
    """A VCF pair always matches the allele string derived from itself —
    exact mode (allele_matches ∘ vep_allele_string = true)."""
    s = vep_allele_string(ref, alt)
    assert allele_matches(ref, alt, s)
    assert allele_matches_relaxed(ref, alt, s)


@given(ref=seq, alt=seq, anchor=base)
@SET
def test_relaxed_tolerates_anchor_base(ref, alt, anchor):
    """Relaxed matching tolerates a shared leading anchor base on both
    alleles (shifted-indel VCF representation)."""
    if len(ref) == len(alt):
        return  # anchor shifting is an indel concern
    s = vep_allele_string(ref, alt)
    assert allele_matches_relaxed(anchor + ref, anchor + alt, s)


@given(ref=seq, alt=seq)
@SET
def test_snv_never_trimmed(ref, alt):
    if len(ref) == 1 and len(alt) == 1:
        vr, va = vcf_to_vep_allele(ref, alt)
        assert (vr, va) == (ref, alt)


@given(pos=st.integers(min_value=1, max_value=10**6), ref=seq, alt=seq)
@SET
def test_norm_start_end_insertion_encoding(pos, ref, alt):
    """VEP exact-match coordinates: insertions encode start = end + 1
    (allele.rs:751-800); deletions/subs keep start <= end."""
    s = vep_norm_start(pos, ref, alt)
    e = vep_norm_end(pos, ref, alt)
    vr, va = vcf_to_vep_allele(ref, alt)
    if vr == "-":  # pure insertion after trimming
        assert s == e + 1
    else:
        assert s <= e


@given(ref=seq, alt=seq, other=seq)
@SET
def test_exact_match_is_injective_on_snvs(ref, alt, other):
    """An SNV only matches strings containing its own alt allele."""
    if len(ref) == 1 and len(alt) == 1 and len(other) == 1 and other != alt:
        assert not allele_matches(ref, other, vep_allele_string(ref, alt)) or other == alt


def test_reference_allele_unit_battery():
    """Exact replay of the reference's allele.rs unit tests (:866-1100):
    VCF→VEP conversion (SNV/ins/del/MNV, no MNV suffix trim), Ensembl
    trim order, exact and relaxed matching incl. multiallelic and
    pipe/comma-joined multi-ALT inputs, and the anchor-base-only input
    trim."""
    from datafusion_bio_functions_spark.functions.alleles import (
        allele_matches,
        allele_matches_relaxed,
        trim_sequences_ensembl,
        vcf_to_vep_allele,
        vcf_to_vep_input_allele,
    )

    assert vcf_to_vep_allele("A", "G") == ("A", "G")
    assert vcf_to_vep_allele("A", "ACGT") == ("-", "CGT")
    assert vcf_to_vep_allele("ACGT", "A") == ("CGT", "-")
    assert vcf_to_vep_allele("AC", "GT") == ("AC", "GT")
    assert vcf_to_vep_allele("ATCG", "ATTT") == ("CG", "TT")
    assert vcf_to_vep_allele("TCAC", "T") == ("CAC", "-")
    # VEP does NOT suffix-trim MNVs
    assert vcf_to_vep_allele("ATCG", "AGCG") == ("TCG", "GCG")
    assert vcf_to_vep_allele("GT", "TT") == ("GT", "TT")

    assert trim_sequences_ensembl("ACGT", "A", 100, end_first=False, strand=1) == (
        "CGT", "-", 101, 103, True
    )
    assert trim_sequences_ensembl("AAAA", "AAA", 100, end_first=True, strand=1) == (
        "A", "-", 100, 100, True
    )

    assert allele_matches("A", "G", "A/G")
    assert not allele_matches("A", "G", "A/T")
    assert allele_matches("A", "G", "A/G/T")
    assert allele_matches("A", "T", "A/G/T")
    assert not allele_matches("A", "C", "A/G/T")
    assert allele_matches("ACGT", "A", "CGT/-")   # prefix-stripped cache
    assert allele_matches("ACGT", "A", "ACGT/-")  # full-VCF-REF cache
    assert allele_matches("A", "ACGT", "-/CGT")
    assert not allele_matches("A", "A", "A/G")    # ref-only never matches
    assert not allele_matches("A", "G", "C/G")    # ref mismatch rejected
    assert not allele_matches("A", "G", "T/G")
    assert allele_matches("AC", "GT", "AC/GT")
    assert not allele_matches("AC", "GT", "TC/GT")
    for sep in ("|", ","):
        assert allele_matches("A", f"G{sep}T", "A/G")
        assert allele_matches("A", f"G{sep}T", "A/T")
        assert not allele_matches("A", f"G{sep}T", "A/C")

    assert not allele_matches("A", "AT", "-/G")
    assert allele_matches_relaxed("A", "AT", "-/G")
    assert not allele_matches("AA", "A", "C/-")
    assert allele_matches_relaxed("AA", "A", "C/-")
    assert not allele_matches_relaxed("A", "G", "C/T")

    assert vcf_to_vep_input_allele(
        62689175, "CATACATATATATATATATATATATAT", "CATATATATATATAT"
    ) == ("ATACATATATATATATATATATATAT", "ATATATATATATAT", 62689176)
    assert vcf_to_vep_input_allele(100, "A", "ATG") == ("-", "TG", 101)


def test_get_matched_variant_alleles_reference_battery():
    """allele.rs test_get_matched_variant_alleles_* + variant_lookup_exec
    compare_existing_variant_matches_point_existing_variant_within_mnv:
    both-trim-order minimization keyed on (ref, alt, pos)."""
    from datafusion_bio_functions_spark.functions import alleles as al

    # repeat-shifted deletion matches its anchored twin
    assert al.get_matched_variant_alleles("AAA/A", 100, "AA/-", 101) == [
        ("A", 0, "-", 0)
    ]
    # multiallelic matches only the shared alt with per-side indices
    assert al.get_matched_variant_alleles("A/G/T", 100, "A/C/T", 100) == [
        ("T", 1, "T", 1)
    ]
    # a point existing variant matches inside an MNV window
    assert al.get_matched_variant_alleles(
        "GATT/TATT", 59546535, "G/T", 59546535
    ) == [("TATT", 0, "T", 0)]
    assert al.match_alleles_ensembl("GATT", "TATT", 59546535, "G/T", 59546535)
    # mismatched positions do not match
    assert not al.match_alleles_ensembl("GATT", "TATT", 59546535, "G/T", 59546536)
    # malformed allele strings are rejected
    assert al.get_matched_variant_alleles("A", 100, "A/T", 100) == []
    assert al.get_matched_variant_alleles("/T", 100, "A/T", 100) == []


def test_compare_space_minimization_reference_cases():
    """variant_lookup_exec.rs compare_existing_variant_uses_minimized_
    compare_allele_space_for_repeat_insertions + _uses_compare_coords_for_
    unknown_insertions: the both-order trim inside get_matched_variant_
    alleles reproduces VEP's compare space, so the repeat insertion
    TTA>TATATATA matches the '-/…/ATATA/…' multiallelic at alt index 2,
    and the VEP-normalized coords give the swapped insertion form the
    unknown-allele rule keys on."""
    from datafusion_bio_functions_spark.functions import alleles as al

    matched = al.get_matched_variant_alleles(
        "TA/ATATATA", 119247098, "-/A/ATA/ATATA/ATATATA", 119247098
    )
    assert [(m[1], m[3]) for m in matched] == [(0, 2)]
    assert matched[0][2] == "ATATA"
    assert al.match_alleles_ensembl(
        "TTA", "TATATATA", 119247097, "-/A/ATA/ATATA/ATATATA", 119247098
    )
    # swapped insertion form for the unknown-allele exact-coords rule
    assert al.vep_norm_start(119247097, "TTA", "TATATATA") == 119247098
    assert al.vep_norm_end(119247097, "TTA", "TATATATA") == 119247097
