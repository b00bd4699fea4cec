"""Transcript consequence engine (phase B of ``annotate_vep``).

Pure-Python re-expression of the reference's consequence assignment
(``bio-function-vep/src/transcript_consequence.rs:801-1124``; SO term
registry + severity ranks ``so_terms.rs:5-299``; HGVS notation
``hgvs.rs:17-45``).  All rules follow the *published* Ensembl VEP / Sequence
Ontology definitions; nothing here executes on the driver — the library is
invoked row-wise inside Arrow-batched pandas UDFs (``operators.vep``), so it
must stay dependency-free and picklable by value.

Scope notes vs the reference:

* splice terms: acceptor/donor (±1-2 intronic), donor 5th base, splice
  region (3-8 intronic / 1-3 exonic), polypyrimidine tract (3-17 intronic
  of the acceptor side) — same windows as VEP.
* coding terms are codon-accurate for SNVs and length-based for indels
  (frameshift vs inframe); stop/start gained/lost/retained via the standard
  genetic code.  The reference's remaining long tail (selenocysteine
  recoding, partial codons at incomplete terminal codons, …) degrades to
  ``coding_sequence_variant`` exactly like VEP does when sequence context is
  missing.
* HGVS: ``g.`` always; ``c.``/``p.`` when CDS context is available (SNV
  substitutions, simple ins/del/delins; no 3'-shifting yet).
"""

from __future__ import annotations

import sys
from dataclasses import dataclass, field

# UDF-side importability: serialize by value (see functions.alleles).
try:  # pragma: no cover - environment dependent
    from pyspark import cloudpickle as _cp

    _cp.register_pickle_by_value(sys.modules[__name__])
except Exception:  # pragma: no cover
    pass

# ---------------------------------------------------------------------------
# SO term registry — severity rank 1..41 + impact (reference so_terms.rs:5-299;
# public VEP "consequence severity" ordering)
# ---------------------------------------------------------------------------

SO_TERMS_BY_RANK: list[tuple[str, str]] = [
    ("transcript_ablation", "HIGH"),
    ("splice_acceptor_variant", "HIGH"),
    ("splice_donor_variant", "HIGH"),
    ("stop_gained", "HIGH"),
    ("frameshift_variant", "HIGH"),
    ("stop_lost", "HIGH"),
    ("start_lost", "HIGH"),
    ("transcript_amplification", "HIGH"),
    ("feature_elongation", "HIGH"),
    ("feature_truncation", "HIGH"),
    ("inframe_insertion", "MODERATE"),
    ("inframe_deletion", "MODERATE"),
    ("missense_variant", "MODERATE"),
    ("protein_altering_variant", "MODERATE"),
    ("splice_donor_5th_base_variant", "LOW"),
    ("splice_region_variant", "LOW"),
    ("splice_donor_region_variant", "LOW"),
    ("splice_polypyrimidine_tract_variant", "LOW"),
    ("incomplete_terminal_codon_variant", "LOW"),
    ("start_retained_variant", "LOW"),
    ("stop_retained_variant", "LOW"),
    ("synonymous_variant", "LOW"),
    ("coding_sequence_variant", "MODIFIER"),
    ("mature_miRNA_variant", "MODIFIER"),
    ("5_prime_UTR_variant", "MODIFIER"),
    ("3_prime_UTR_variant", "MODIFIER"),
    ("non_coding_transcript_exon_variant", "MODIFIER"),
    ("intron_variant", "MODIFIER"),
    ("NMD_transcript_variant", "MODIFIER"),
    ("non_coding_transcript_variant", "MODIFIER"),
    ("coding_transcript_variant", "MODIFIER"),
    ("upstream_gene_variant", "MODIFIER"),
    ("downstream_gene_variant", "MODIFIER"),
    ("TFBS_ablation", "MODIFIER"),
    ("TFBS_amplification", "MODIFIER"),
    ("TF_binding_site_variant", "MODIFIER"),
    ("regulatory_region_ablation", "MODIFIER"),
    ("regulatory_region_amplification", "MODIFIER"),
    ("regulatory_region_variant", "MODIFIER"),
    ("intergenic_variant", "MODIFIER"),
    ("sequence_variant", "MODIFIER"),
]

SO_RANK: dict[str, int] = {t: i + 1 for i, (t, _) in enumerate(SO_TERMS_BY_RANK)}
SO_IMPACT: dict[str, str] = dict(SO_TERMS_BY_RANK)


def most_severe(terms: list[str]) -> str | None:
    """Collapse a term list to the most severe one (lowest rank; reference
    ``transcript_consequence.rs:1124``)."""
    best, best_rank = None, 10**9
    for t in terms:
        r = SO_RANK.get(t, 10**9)
        if r < best_rank:
            best, best_rank = t, r
    return best


# ---------------------------------------------------------------------------
# genetic code
# ---------------------------------------------------------------------------

_BASES = "TCAG"
_AMINO = (
    "FFLLSSSSYY**CC*W"  # TTT..TGG
    "LLLLPPPPHHQQRRRR"
    "IIIMTTTTNNKKSSRR"
    "VVVVAAAADDEEGGGG"
)
CODON_TABLE: dict[str, str] = {
    a + b + c: _AMINO[i * 16 + j * 4 + k]
    for i, a in enumerate(_BASES)
    for j, b in enumerate(_BASES)
    for k, c in enumerate(_BASES)
}
_COMP = str.maketrans("ACGTNacgtn", "TGCANtgcan")

AA3 = {
    "A": "Ala", "R": "Arg", "N": "Asn", "D": "Asp", "C": "Cys", "Q": "Gln",
    "E": "Glu", "G": "Gly", "H": "His", "I": "Ile", "L": "Leu", "K": "Lys",
    "M": "Met", "F": "Phe", "P": "Pro", "S": "Ser", "T": "Thr", "W": "Trp",
    "Y": "Tyr", "V": "Val", "*": "Ter",
}


def revcomp(seq: str) -> str:
    return seq.translate(_COMP)[::-1]


def translate(cds: str) -> str:
    return "".join(
        CODON_TABLE.get(cds[i : i + 3].upper(), "X") for i in range(0, len(cds) - 2, 3)
    )


# ---------------------------------------------------------------------------
# transcript model
# ---------------------------------------------------------------------------


@dataclass
class Transcript:
    """Genomic transcript context (1-based closed coordinates).

    ``exons``: genomic (start, end) pairs, any order.  ``cds_start``/
    ``cds_end``: genomic bounds of the coding region (None → non-coding).
    ``cds_sequence``: spliced coding sequence 5'→3' (transcript orientation);
    when absent, coding effects degrade to ``coding_sequence_variant``.
    """

    transcript_id: str
    chrom: str
    start: int
    end: int
    strand: int  # +1 / -1
    biotype: str = "protein_coding"
    gene_id: str = ""
    gene_symbol: str = ""
    exons: list[tuple[int, int]] = field(default_factory=list)
    cds_start: int | None = None
    cds_end: int | None = None
    cds_sequence: str | None = None
    is_canonical: bool = False

    def sorted_exons(self) -> list[tuple[int, int]]:
        return sorted(self.exons) if self.exons else [(self.start, self.end)]


def _genomic_to_cds_offset(t: Transcript, pos: int) -> int | None:
    """0-based offset of genomic ``pos`` within the spliced CDS, or None if
    the position is not coding."""
    if t.cds_start is None or t.cds_end is None:
        return None
    if pos < t.cds_start or pos > t.cds_end:
        return None
    off = 0
    for es, ee in t.sorted_exons():
        s, e = max(es, t.cds_start), min(ee, t.cds_end)
        if s > e:
            continue
        if pos < s:
            return None  # intronic inside CDS span
        if pos <= e:
            off += pos - s
            break
        off += e - s + 1
    else:
        return None
    if t.strand >= 0:
        return off
    total = sum(
        max(0, min(ee, t.cds_end) - max(es, t.cds_start) + 1) for es, ee in t.sorted_exons()
    )
    return total - 1 - off


# ---------------------------------------------------------------------------
# consequence classification
# ---------------------------------------------------------------------------


def _splice_terms(t: Transcript, lo: int, hi: int) -> tuple[list[str], bool]:
    """Splice-site terms for variant span [lo, hi]; returns (terms,
    is_intronic_only).  Windows follow published VEP definitions."""
    exons = t.sorted_exons()
    terms: list[str] = []
    in_exon = any(not (hi < es or lo > ee) for es, ee in exons)

    for i in range(len(exons) - 1):
        ie_s, ie_e = exons[i][1] + 1, exons[i + 1][0] - 1  # intron span
        if ie_s > ie_e or hi < ie_s or lo > ie_e:
            continue
        # orientation: donor side = 5' end of the intron in transcript sense
        if t.strand >= 0:
            donor = (ie_s, min(ie_s + 1, ie_e))
            donor5 = ie_s + 4
            acceptor = (max(ie_e - 1, ie_s), ie_e)
            donor_region = (ie_s + 2, min(ie_s + 7, ie_e))
            ppt = (max(ie_e - 16, ie_s), ie_e - 2)
        else:
            donor = (max(ie_e - 1, ie_s), ie_e)
            donor5 = ie_e - 4
            acceptor = (ie_s, min(ie_s + 1, ie_e))
            donor_region = (max(ie_e - 7, ie_s), ie_e - 2)
            ppt = (ie_s + 2, min(ie_s + 16, ie_e))
        if not (hi < donor[0] or lo > donor[1]):
            terms.append("splice_donor_variant")
        if not (hi < acceptor[0] or lo > acceptor[1]):
            terms.append("splice_acceptor_variant")
        if lo <= donor5 <= hi and "splice_donor_variant" not in terms:
            terms.append("splice_donor_5th_base_variant")
        if not (hi < donor_region[0] or lo > donor_region[1]):
            terms.append("splice_donor_region_variant")
        if ppt[0] <= ppt[1] and not (hi < ppt[0] or lo > ppt[1]):
            terms.append("splice_polypyrimidine_tract_variant")
        # generic splice_region: 3-8 intronic either side
        for ws, we in (
            (ie_s + 2, min(ie_s + 7, ie_e)),
            (max(ie_e - 7, ie_s), ie_e - 2),
        ):
            if ws <= we and not (hi < ws or lo > we):
                if "splice_region_variant" not in terms:
                    terms.append("splice_region_variant")

    # exonic splice region: first/last 3 bases of an internal exon edge
    for i, (es, ee) in enumerate(exons):
        if i > 0 and not (hi < es or lo > es + 2):  # exon start edge (has upstream intron)
            if "splice_region_variant" not in terms:
                terms.append("splice_region_variant")
        if i < len(exons) - 1 and not (hi < ee - 2 or lo > ee):
            if "splice_region_variant" not in terms:
                terms.append("splice_region_variant")
    return terms, not in_exon


def _coding_terms(t: Transcript, pos: int, ref: str, alt: str) -> list[str]:
    """Codon-level terms for a variant fully inside the CDS."""
    ref, alt = ref.upper(), alt.upper()
    if ref == "-":
        ref = ""
    if alt == "-":
        alt = ""
    dlen = len(alt) - len(ref)

    if t.cds_sequence is None:
        if dlen == 0:
            return ["coding_sequence_variant"]
        return ["frameshift_variant"] if dlen % 3 else (
            ["inframe_insertion"] if dlen > 0 else ["inframe_deletion"]
        )

    cds = t.cds_sequence.upper()
    protein = translate(cds)

    if dlen != 0:
        if dlen % 3 != 0:
            return ["frameshift_variant"]
        return ["inframe_insertion"] if dlen > 0 else ["inframe_deletion"]

    # SNV / MNV substitution
    off = _genomic_to_cds_offset(t, pos)
    if off is None:
        return ["coding_sequence_variant"]
    var_ref = ref if t.strand >= 0 else revcomp(ref)
    var_alt = alt if t.strand >= 0 else revcomp(alt)
    if t.strand < 0:
        off = off - (len(var_ref) - 1)
        if off < 0:
            return ["coding_sequence_variant"]
    if off + len(var_ref) > len(cds):
        return ["incomplete_terminal_codon_variant"]
    if var_ref and cds[off : off + len(var_ref)] != var_ref:
        # reference mismatch — classify positionally only
        return ["coding_sequence_variant"]
    new_cds = cds[:off] + var_alt + cds[off + len(var_ref) :]
    new_protein = translate(new_cds)

    codon_i = off // 3
    aa_old = protein[codon_i] if codon_i < len(protein) else ""
    aa_new = new_protein[codon_i] if codon_i < len(new_protein) else ""

    terms: list[str] = []
    if codon_i == 0:
        if aa_new == aa_old == "M" and new_cds[:3] != cds[:3]:
            return ["start_retained_variant"]
        if aa_old == "M" and aa_new != "M":
            return ["start_lost"]
    if aa_old == "*" and aa_new == "*":
        return ["stop_retained_variant"]
    if aa_old == "*" and aa_new != "*":
        return ["stop_lost"]
    if aa_new == "*" and aa_old != "*":
        return ["stop_gained"]
    if aa_old == aa_new:
        terms.append("synonymous_variant")
    else:
        terms.append("missense_variant")
    return terms


def classify(
    t: Transcript,
    pos: int,
    ref: str,
    alt: str,
    upstream_distance: int = 5000,
    downstream_distance: int = 500,
) -> list[str]:
    """All SO terms for one (variant, transcript) pair.  ``pos`` is the
    1-based genomic start of ``ref``; empty/'-' alleles express pure
    ins/del.  Mirrors the reference engine's evaluation order
    (``transcript_consequence.rs:839-874``)."""
    ref = "" if ref in ("-", None) else ref
    alt = "" if alt in ("-", None) else alt
    lo, hi = pos, max(pos, pos + len(ref) - 1)

    # outside the transcript: up/downstream by strand
    if hi < t.start or lo > t.end:
        if t.strand >= 0:
            before, dist_before = hi < t.start, t.start - hi
            dist_after = lo - t.end
        else:
            before, dist_before = lo > t.end, lo - t.end
            dist_after = t.start - hi
        if before and dist_before <= upstream_distance:
            return ["upstream_gene_variant"]
        if not before and dist_after <= downstream_distance:
            return ["downstream_gene_variant"]
        return []

    terms, intronic_only = _splice_terms(t, lo, hi)
    coding_tx = t.biotype == "protein_coding" and t.cds_start is not None

    if intronic_only:
        terms.append("intron_variant")
    elif not coding_tx:
        # protein_coding without CDS context degrades to the coding catch-all
        if t.biotype == "protein_coding":
            terms.append("coding_transcript_variant")
        else:
            terms.append("non_coding_transcript_exon_variant")
    else:
        if hi < t.cds_start or lo > t.cds_end:
            five_side = lo < t.cds_start if t.strand >= 0 else hi > t.cds_end
            terms.append("5_prime_UTR_variant" if five_side else "3_prime_UTR_variant")
        elif lo >= t.cds_start and hi <= t.cds_end:
            terms.extend(_coding_terms(t, pos, ref, alt))
        else:
            terms.append("coding_sequence_variant")  # straddles a CDS edge

    if t.biotype == "nonsense_mediated_decay":
        terms.append("NMD_transcript_variant")
    if not coding_tx and t.biotype != "protein_coding":
        if t.biotype == "miRNA" and not intronic_only:
            terms.append("mature_miRNA_variant")
        terms.append("non_coding_transcript_variant")
    return terms or ["sequence_variant"]


# ---------------------------------------------------------------------------
# typed annotation details (reference annotate_provider.rs:145-707 —
# transcript-level columns EXON/INTRON/cDNA_position/CDS_position/
# Protein_position/Amino_acids/Codons/VARIANT_CLASS/DISTANCE)
# ---------------------------------------------------------------------------


def variant_class(ref: str, alt: str) -> str:
    """Sequence-ontology variant class (VEP ``VARIANT_CLASS`` column)."""
    ref = "" if ref in ("-", None) else ref
    alt = "" if alt in ("-", None) else alt
    if len(ref) == 1 and len(alt) == 1:
        return "SNV"
    if len(ref) == 0 or (len(alt) > len(ref) and alt.startswith(ref)):
        return "insertion"
    if len(alt) == 0 or (len(ref) > len(alt) and ref.startswith(alt)):
        return "deletion"
    if len(ref) == len(alt):
        return "substitution"
    return "indel"


def exon_intron_numbers(t: Transcript, lo: int, hi: int) -> tuple[str | None, str | None]:
    """VEP ``EXON`` / ``INTRON`` columns: ``"i/total"`` in transcript
    orientation for the exon/intron overlapped by [lo, hi] (None when not
    overlapping any).  Multi-feature spans report the first overlapped
    feature in transcript order, matching VEP's per-feature rendering."""
    exons = t.sorted_exons()
    n_ex = len(exons)
    n_in = n_ex - 1
    ex_hit = in_hit = None
    for i in range(n_ex):
        es, ee = exons[i]
        if not (hi < es or lo > ee):
            ex_hit = i if ex_hit is None else ex_hit
        if i < n_ex - 1:
            is_, ie = exons[i][1] + 1, exons[i + 1][0] - 1
            if is_ <= ie and not (hi < is_ or lo > ie):
                in_hit = i if in_hit is None else in_hit
    if t.strand < 0:  # transcript orientation numbers from the 3' genomic end
        ex_hit = None if ex_hit is None else n_ex - 1 - ex_hit
        in_hit = None if in_hit is None else n_in - 1 - in_hit
    exon = f"{ex_hit + 1}/{n_ex}" if ex_hit is not None else None
    intron = f"{in_hit + 1}/{n_in}" if in_hit is not None and n_in > 0 else None
    return exon, intron


def _genomic_to_cdna_offset(t: Transcript, pos: int) -> int | None:
    """0-based offset of genomic ``pos`` within the spliced transcript
    (all exons, transcript orientation), or None when intronic/outside."""
    off = 0
    total = 0
    hit = None
    for es, ee in t.sorted_exons():
        if es <= pos <= ee:
            hit = off + (pos - es)
        if pos > ee:
            off += ee - es + 1
        total += ee - es + 1
    if hit is None:
        return None
    return hit if t.strand >= 0 else total - 1 - hit


def annotation_details(t: Transcript, pos: int, ref: str, alt: str) -> dict:
    """Typed per-(variant, transcript) annotation columns.  Keys:
    ``exon intron cdna_position cds_position protein_position amino_acids
    codons distance``.  Sequence-dependent values (amino_acids, codons) are
    None without ``cds_sequence`` — the same degradation VEP applies when
    sequence context is missing."""
    ref = "" if ref in ("-", None) else ref
    alt = "" if alt in ("-", None) else alt
    lo, hi = pos, max(pos, pos + len(ref) - 1)
    out: dict = {
        "exon": None, "intron": None, "cdna_position": None,
        "cds_position": None, "protein_position": None,
        "amino_acids": None, "codons": None, "distance": None,
    }
    if hi < t.start or lo > t.end:  # up/downstream: DISTANCE column
        out["distance"] = int(t.start - hi if hi < t.start else lo - t.end)
        return out
    out["exon"], out["intron"] = exon_intron_numbers(t, lo, hi)
    cdna = _genomic_to_cdna_offset(t, pos if t.strand >= 0 else hi)
    if cdna is not None:
        out["cdna_position"] = cdna + 1
    off = _cds_first_offset(t, pos, len(ref))
    if off is None:
        return out
    out["cds_position"] = off + 1
    out["protein_position"] = off // 3 + 1
    if t.cds_sequence is None or len(ref) != len(alt) or not ref:
        return out
    cds = t.cds_sequence.upper()
    var_ref = ref.upper() if t.strand >= 0 else revcomp(ref.upper())
    var_alt = alt.upper() if t.strand >= 0 else revcomp(alt.upper())
    if off + len(var_ref) > len(cds) or cds[off : off + len(var_ref)] != var_ref:
        return out
    new_cds = cds[:off] + var_alt + cds[off + len(var_ref) :]
    c0 = (off // 3) * 3
    c1 = ((off + len(var_ref) - 1) // 3) * 3 + 3
    old_codons = cds[c0:c1]
    new_codons = new_cds[c0:c1]
    # VEP renders affected bases uppercase within lowercase codons
    def _render(codons: str) -> str:
        rendered = []
        for i, b in enumerate(codons):
            g = c0 + i
            rendered.append(b.upper() if off <= g < off + len(var_ref) else b.lower())
        return "".join(rendered)

    out["codons"] = f"{_render(old_codons)}/{_render(new_codons)}"
    aa_old = translate(old_codons)
    aa_new = translate(new_codons)
    out["amino_acids"] = aa_old if aa_old == aa_new else f"{aa_old}/{aa_new}"
    return out


# ---------------------------------------------------------------------------
# HGVS-lite (reference hgvs.rs:17-45; public HGVS nomenclature)
# ---------------------------------------------------------------------------


def hgvs_g(chrom: str, pos: int, ref: str, alt: str) -> str:
    ref = "" if ref in ("-", None) else ref
    alt = "" if alt in ("-", None) else alt
    if len(ref) == 1 and len(alt) == 1:
        return f"{chrom}:g.{pos}{ref}>{alt}"
    if len(ref) == 0:
        return f"{chrom}:g.{pos}_{pos + 1}ins{alt}"
    end = pos + len(ref) - 1
    span = f"{pos}_{end}" if end > pos else f"{pos}"
    if len(alt) == 0:
        return f"{chrom}:g.{span}del"
    return f"{chrom}:g.{span}delins{alt}"


def _cds_first_offset(t: Transcript, pos: int, ref_len: int) -> int | None:
    """0-based CDS offset of the *transcript-orientation first* affected
    base of a ref span [pos, pos+ref_len-1] (on − strand the genomic
    rightmost base is transcript-first)."""
    g = pos if t.strand >= 0 else pos + max(ref_len, 1) - 1
    return _genomic_to_cds_offset(t, g)


def _shift3(cds: str, start0: int, seq: str) -> tuple[int, str]:
    """HGVS 3'-rule: roll a del/ins event rightward while the base following
    the event equals its first base (``hgvs.rs`` 3'-shifting; published HGVS
    recommendation).  Returns (new start0, rotated event sequence)."""
    s, rot = start0, list(seq)
    ln = len(rot)
    while ln and s + ln < len(cds) and cds[s + ln] == rot[0]:
        rot.append(rot.pop(0))
        s += 1
    return s, "".join(rot)


def hgvs_c(t: Transcript, pos: int, ref: str, alt: str) -> str | None:
    """cDNA notation: substitutions, del/ins/dup/delins with 3'-shifting and
    dup detection when ``cds_sequence`` context is available (reference
    ``hgvs.rs:17-45``)."""
    ref = "" if ref in ("-", None) else ref
    alt = "" if alt in ("-", None) else alt
    off = _cds_first_offset(t, pos, len(ref))
    if off is None:
        return None
    r = ref if t.strand >= 0 else revcomp(ref)
    a = alt if t.strand >= 0 else revcomp(alt)
    cds = t.cds_sequence.upper() if t.cds_sequence else None
    cpos = off + 1
    if len(r) == 1 and len(a) == 1:
        return f"{t.transcript_id}:c.{cpos}{r}>{a}"
    if len(r) == 0:  # pure insertion between the two flanking bases
        # 0-based CDS index the inserted seq lands before: the anchor base
        # (genomic pos) is the 5' flank on +, the 3' flank on −
        ins_at = off + 1 if t.strand >= 0 else off
        seq = a.upper()
        if cds is not None:
            ins_at, seq = _shift3(cds, cpos, seq)
            # dup: inserted seq equals the bases immediately 5' of the site
            ln = len(seq)
            if ins_at - ln >= 0 and cds[ins_at - ln : ins_at] == seq:
                span = f"{ins_at - ln + 1}_{ins_at}" if ln > 1 else f"{ins_at}"
                return f"{t.transcript_id}:c.{span}dup"
        return f"{t.transcript_id}:c.{ins_at}_{ins_at + 1}ins{seq}"
    if len(a) == 0:  # pure deletion
        start0, seq = (off, r.upper())
        if cds is not None and cds[start0 : start0 + len(seq)] == seq:
            start0, seq = _shift3(cds, start0, seq)
        cstart, cend = start0 + 1, start0 + len(seq)
        span = f"{cstart}_{cend}" if cend > cstart else f"{cstart}"
        return f"{t.transcript_id}:c.{span}del"
    cend = cpos + len(r) - 1
    span = f"{cpos}_{cend}" if cend > cpos else f"{cpos}"
    return f"{t.transcript_id}:c.{span}delins{a}"


def _aa3(aa: str) -> str:
    return AA3.get(aa, "Xaa")


def hgvs_p(t: Transcript, pos: int, ref: str, alt: str) -> str | None:
    """Protein notation: substitutions, synonymous (=), stop gained (Ter),
    inframe del/ins/delins, frameshift (``fsTer#``), and stop-lost extension
    (``extTer#``) — reference ``hgvs.rs`` frameshift/extension notation."""
    if t.cds_sequence is None:
        return None
    ref = "" if ref in ("-", None) else ref
    alt = "" if alt in ("-", None) else alt
    if not ref and not alt:
        return None
    off = _cds_first_offset(t, pos, len(ref))
    if off is None:
        return None
    cds = t.cds_sequence.upper()
    var_ref = ref.upper() if t.strand >= 0 else revcomp(ref.upper())
    var_alt = alt.upper() if t.strand >= 0 else revcomp(alt.upper())
    if off + len(var_ref) > len(cds) or (var_ref and cds[off : off + len(var_ref)] != var_ref):
        return None
    # pure insertions land after the 5'-flank (transcript sense): genomic
    # anchor pos is the 5' flank on +, the 3' flank on −
    ins_point = off if var_ref else (off + 1 if t.strand >= 0 else off)
    new_cds = cds[:ins_point] + var_alt + cds[ins_point + len(var_ref) :]
    prot_old = translate(cds)
    prot_new = translate(new_cds)
    tid = t.transcript_id

    if len(var_ref) == len(var_alt):  # substitution / MNV
        ci = off // 3
        if ci >= len(prot_old):
            return None
        aa_old = prot_old[ci]
        aa_new = prot_new[ci] if ci < len(prot_new) else ""
        if not aa_new:
            return None
        if aa_old == aa_new:
            return f"{tid}:p.{_aa3(aa_old)}{ci + 1}="
        return f"{tid}:p.{_aa3(aa_old)}{ci + 1}{_aa3(aa_new)}"

    # indel: diff the proteins
    i = 0
    lim = min(len(prot_old), len(prot_new))
    while i < lim and prot_old[i] == prot_new[i]:
        i += 1
    if i == lim and len(prot_old) == len(prot_new):
        ci = min(off // 3, len(prot_old) - 1)
        return f"{tid}:p.{_aa3(prot_old[ci])}{ci + 1}="

    if (len(var_alt) - len(var_ref)) % 3 == 0:  # inframe
        k = (len(var_ref) - len(var_alt)) // 3
        if k > 0 and prot_new == prot_old[:i] + prot_old[i + k :]:  # clean deletion
            if k == 1:
                return f"{tid}:p.{_aa3(prot_old[i])}{i + 1}del"
            return f"{tid}:p.{_aa3(prot_old[i])}{i + 1}_{_aa3(prot_old[i + k - 1])}{i + k}del"
        if k < 0 and prot_old == prot_new[:i] + prot_new[i - k :]:  # clean insertion
            ins = "".join(_aa3(x) for x in prot_new[i : i - k])
            if i == 0:
                return f"{tid}:p.{_aa3(prot_new[i - k - 1])}?ins{ins}"
            return f"{tid}:p.{_aa3(prot_old[i - 1])}{i}_{_aa3(prot_old[i])}{i + 1}ins{ins}"
        # delins: first..last changed old aa replaced
        j_old, j_new = len(prot_old) - 1, len(prot_new) - 1
        while j_old > i and j_new > i and prot_old[j_old] == prot_new[j_new]:
            j_old -= 1
            j_new -= 1
        ins = "".join(_aa3(x) for x in prot_new[i : j_new + 1])
        span = f"{_aa3(prot_old[i])}{i + 1}"
        if j_old > i:
            span += f"_{_aa3(prot_old[j_old])}{j_old + 1}"
        return f"{tid}:p.{span}delins{ins}"

    # frameshift
    if i >= len(prot_old) or i >= len(prot_new):
        return None
    aa_old, aa_new = prot_old[i], prot_new[i]
    if aa_old == "*":  # stop lost → extension
        stop = prot_new.find("*", i)
        ext = stop - i if stop >= 0 else "?"
        return f"{tid}:p.Ter{i + 1}{_aa3(aa_new)}extTer{ext}"
    if aa_new == "*":
        return f"{tid}:p.{_aa3(aa_old)}{i + 1}Ter"
    stop = prot_new.find("*", i)
    fs = f"Ter{stop - i + 1}" if stop >= 0 else "Ter?"
    return f"{tid}:p.{_aa3(aa_old)}{i + 1}{_aa3(aa_new)}fs{fs}"
