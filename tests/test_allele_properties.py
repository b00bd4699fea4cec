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
