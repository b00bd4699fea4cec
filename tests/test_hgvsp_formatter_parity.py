"""Replays of the reference's format_hgvsp pipeline unit battery
(``bio-function-vep/src/hgvs.rs`` test module) against the Python port in
``functions/consequence.py``.  The reference translation fixture is
``ENSPHGVS000001`` version 1 → protein id "ENSPHGVS000001.1"."""

from __future__ import annotations

from datafusion_bio_functions_spark.functions import consequence as cq

PID = "ENSPHGVS000001.1"


def P(start, end, ref_pep, alt_pep, ref_tr, alt_tr, *, ext=None,
      fs=False, start_lost=False, stop_lost=False):
    return cq.ProteinHgvs(
        start=start, end=end, ref_peptide=ref_pep, alt_peptide=alt_pep,
        ref_translation=ref_tr, alt_translation=alt_tr,
        alt_translation_extension=ext, frameshift=fs,
        start_lost=start_lost, stop_lost=stop_lost,
    )


def N(start, end, ref, alt, kind="ins", original_ref="", preseq=""):
    return cq.ProteinHgvsNotation(
        start=start, end=end, ref_allele=ref, alt_allele=alt,
        original_ref=original_ref, preseq=preseq, kind=kind,
    )


def F(protein, shift=True):
    return cq.format_hgvsp(PID, protein, shift)


# ---------------------------------------------------------------------------
# format_hgvsp end-to-end (hgvs.rs test_format_hgvsp_*)
# ---------------------------------------------------------------------------


def test_format_hgvsp_substitution_family():
    # missense
    assert F(P(2, 2, "A", "V", "MA*", "MV*")) == f"{PID}:p.Ala2Val"
    # synonymous
    assert F(P(2, 2, "A", "A", "MA*", "MA*")) == f"{PID}:p.Ala2="
    # partial-codon synonymous renders Ter (X→Ter HGVS display)
    assert F(P(262, 262, "X", "X", "XRVM", "XRVM")) == f"{PID}:p.Ter262="
    # multi-residue synonymous keeps the full peptide string + start pos
    tr = "M" * 24 + "EEEEK"
    assert F(P(25, 26, "EE", "EE", tr, tr)) == f"{PID}:p.GluGlu25="
    # delins
    assert F(P(2, 2, "A", "VW", "MAK*", "MVWK*")) == f"{PID}:p.Ala2delinsValTrp"
    # start lost reports unknown protein effect
    assert F(P(1, 1, "M", "L", "MA*", "LA*", start_lost=True)) == f"{PID}:p.Met1?"


def test_format_hgvsp_deletions():
    assert F(P(2, 2, "A", "-", "MA*", "M*")) == f"{PID}:p.Ala2del"
    assert F(P(2, 3, "AK", "-", "MAK*", "M*")) == f"{PID}:p.Ala2_Lys3del"


def test_format_hgvsp_shift_hgvs_flag_gates_peptide_shift():
    # hgvs.rs test_format_hgvsp_shift_hgvs_false_disables_three_prime_
    # peptide_shift: the deletion of one of two Ala residues renders at
    # the variant position without shifting, at the 3'-most with it
    p = P(2, 2, "A", "-", "MAA*", "MA*")
    assert F(p, shift=False) == f"{PID}:p.Ala2del"
    assert F(p, shift=True) == f"{PID}:p.Ala3del"


def test_format_hgvsp_insertions():
    # flanking residues around a plain insertion
    assert F(P(2, 3, "-", "Q", "MAV*", "MAQV*")) == f"{PID}:p.Ala2_Val3insGln"
    # insertion equal to the upstream residue renders dup
    assert F(P(4, 4, "-", "A", "MAA*", "MAAA*")) == f"{PID}:p.Ala3dup"
    # clipped insertion becomes dup (codon window widened for insertions)
    assert F(P(3, 3, "A", "AA", "MAAK", "MAAAK")) == f"{PID}:p.Ala3dup"
    # multi-residue clipped dup with range coordinates
    ref_tr = "M" + "G" * 50 + "R"
    alt_tr = "M" + "G" * 53 + "R"
    assert F(P(48, 50, "GGG", "GGGGGG", ref_tr, alt_tr)) == f"{PID}:p.Gly48_Gly50dup"
    # chr3:63912714 regression: non-empty preseq blocks the dup fallback
    # window → stays an insertion (peptide_dup_chr3_63912714_should_be_
    # ins_not_dup)
    ref_tr = "M" * 34 + "QQQQQPPPP" + "QP"
    alt_tr = ref_tr[:39] + "QQP" + ref_tr[39:]
    out = F(P(39, 39, "Q", "QQQP", ref_tr, alt_tr))
    assert out is not None and "ins" in out and "dup" not in out


def test_format_hgvsp_frameshift_family():
    # immediate stop at the first changed residue → Ter form
    assert F(P(2, 2, "A", "*", "MAK*", "M*", fs=True)) == f"{PID}:p.Ala2Ter"
    # walk to the first changed residue + stop distance
    assert F(P(3, 3, "K", "Q", "MKKKK", "MKQW*", fs=True)) == f"{PID}:p.Lys3GlnfsTer3"


def test_format_hgvsp_stop_lost_extension():
    assert F(P(3, 3, "*", "Q", "MA*", "MAQW*", stop_lost=True)) == f"{PID}:p.Ter3GlnextTer2"
    assert F(P(3, 3, "*", "Q", "MA*", "MAQ*", stop_lost=True)) == f"{PID}:p.Ter3GlnextTer1"
    # no stop reachable in the alt translation → extTer?
    assert F(P(3, 3, "*", "Q", "MA*", "MAQ", stop_lost=True)) == f"{PID}:p.Ter3GlnextTer?"


# ---------------------------------------------------------------------------
# helper units (hgvs.rs test_* helper batteries)
# ---------------------------------------------------------------------------


def test_stop_loss_extra_aa_reference_cases():
    f = cq.stop_loss_extra_aa
    # uses the cached-peptide length (terminal * stripped)
    assert f(P(5, 5, "*", "Q", "MKKR*", "MKKRQW*", stop_lost=True), 4, False) == 2
    # internal stops of LoF transcripts count toward the length
    assert f(P(2, 2, "*", "Q", "M*KR*", "MQKRW*", stop_lost=True), 1, False) == 1
    # no new stop → None (renders extTer?)
    assert f(P(3, 3, "*", "Q", "MA*", "MAQ", stop_lost=True), 2, False) is None
    # zero extension → None
    assert f(P(3, 3, "*", "Q", "MAK*", "MAQ*", stop_lost=True), 2, False) is None
    # frameshift counts from the variant position
    assert f(P(3, 3, "K", "Q", "MKKK*", "MKQW*", fs=True), 3, True) == 2


def test_check_for_peptide_duplication_reference_cases():
    # match at the single VEP window (start - alt_len - 1)
    n = N(4, 5, "", "K")
    assert cq.check_for_peptide_duplication(n, "MAKL*")
    assert (n.kind, n.start, n.end) == ("dup", 3, 3)
    # upstream mismatch: NO fallback window, stays ins
    n = N(3, 4, "", "K")
    assert not cq.check_for_peptide_duplication(n, "MAKL*")
    assert n.kind == "ins"
    # no match at all
    n = N(3, 3, "", "W")
    assert not cq.check_for_peptide_duplication(n, "MAKL*")
    assert n.kind == "ins"
    # multi-residue window
    n = N(5, 6, "", "KL")
    assert cq.check_for_peptide_duplication(n, "MAKLKL*")
    assert (n.kind, n.start, n.end) == ("dup", 3, 4)


def test_peptide_dup_at_reference_cases():
    # repeat run: coordinates stay at the direct upstream match
    n = N(6, 6, "", "E")
    assert cq.check_for_peptide_duplication(n, "MAAAEEEEK")
    assert (n.start, n.end) == (5, 5)
    # single residue, no shift needed
    n = N(4, 4, "", "E")
    assert cq.check_for_peptide_duplication(n, "MAEK")
    assert (n.start, n.end) == (3, 3)
    # multi-residue periodic repeat
    n = N(4, 5, "", "PA")
    assert cq.check_for_peptide_duplication(n, "MPAPAPAD")
    assert (n.start, n.end) == (2, 3)
    # initial match at the reference end
    n = N(5, 5, "", "E")
    assert cq.check_for_peptide_duplication(n, "MAAEE")
    assert (n.start, n.end) == (4, 4)
    # issue-89: the dup check itself performs no extra 3' walk
    ref_tr = "M" * 24 + "EEEEK"
    n = N(26, 26, "", "E")
    assert cq.check_for_peptide_duplication(n, ref_tr)
    assert (n.start, n.end) == (25, 25)


def test_surrounding_peptides_reference_cases():
    assert cq.surrounding_peptides("MAKL*", 2, "", 2) == "AK"
    assert cq.surrounding_peptides("MAKL*", 1, "", 2) == "MA"
    # a '*'-leading original ref extends the readable translation
    assert cq.surrounding_peptides("MAK", 3, "*Q", 2) == "K*"


def test_small_helper_reference_cases():
    assert cq.normalize_peptide_allele("-") == ""
    assert cq.normalize_peptide_allele("K") == "K"
    assert cq.append_terminal_stop("MAK") == "MAK*"
    assert cq.append_terminal_stop("MAK*") == "MAK*"
    assert cq.append_terminal_stop("M*K") == "M*K"  # internal stop counts
    assert cq.protein_event_type("", "K", False) == "ins"
    assert cq.protein_event_type("K", "", False) == "del"
    assert cq.protein_event_type("K", "L", False) == ">"
    assert cq.protein_event_type("KL", "QW", False) == "delins"
    assert cq.protein_event_type("K", "L", True) == "fs"
    assert cq.protein_event_type("K", "K", False) == "="
    assert cq.peptide_char("MAKL", 1) == "M"
    assert cq.peptide_char("MAKL", 4) == "L"
    assert cq.peptide_char("MAKL", 5) is None
    assert cq.peptide_char("MAKL", 0) is None
