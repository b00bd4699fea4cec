"""Consequence engine (phase B) — library-level truth tables + the Spark
``annotate_vep`` codon path on a hand-built transcript model.

Expected terms hand-derived from the published Ensembl VEP / Sequence
Ontology definitions (mirrors the reference's in-module rule tests,
``transcript_consequence.rs``; severity table ``so_terms.rs:5-299``).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datafusion_bio_functions_spark.functions import consequence as cq
from datafusion_bio_functions_spark.operators.vep import annotate_vep

# ---------------------------------------------------------------------------
# model: a 2-exon forward gene
#   exon1 100-129, intron 130-169, exon2 170-219
#   CDS 110..199 (UTR5 100-109, UTR3 200-219)
#   spliced CDS = genomic 110-129 (20nt) + 170-199 (30nt) → 50nt? Needs %3==0:
#   use CDS 110..130? 130 is intronic. Use exon1 110-129 (20) + exon2 170-200
#   (31) = 51nt = 17 codons.  cds_end therefore 200.
# ---------------------------------------------------------------------------

# 17 codons: ATG, 7×Ala, 7×Trp, Glu, TAA stop = 51 nt.
CDS = "ATG" + "GCT" * 7 + "TGG" * 7 + "GAA" + "TAA"
assert len(CDS) == 51


def fwd_tx(**kw):
    base = dict(
        transcript_id="T1",
        chrom="chr1",
        start=100,
        end=219,
        strand=1,
        biotype="protein_coding",
        exons=[(100, 129), (170, 219)],
        cds_start=110,
        cds_end=200,
        cds_sequence=CDS,
    )
    base.update(kw)
    return cq.Transcript(**base)


def rev_tx(**kw):
    """Reverse-strand gene on 100-219: CDS genomic 110..200; spliced CDS is
    the revcomp of genomic [exon segments]."""
    # genomic coding sequence (plus strand) must equal revcomp(CDS) laid into
    # the same exon structure: exon2-part(170..200, 31nt) then exon1-part
    # (110..129, 20nt) reading 5'→3' on minus strand = revcomp of CDS.
    base = dict(
        transcript_id="T2",
        chrom="chr1",
        start=100,
        end=219,
        strand=-1,
        biotype="protein_coding",
        exons=[(100, 129), (170, 219)],
        cds_start=110,
        cds_end=200,
        cds_sequence=CDS,
    )
    base.update(kw)
    return cq.Transcript(**base)


def plus_strand_base(off: int) -> str:
    """Plus-strand base at CDS offset ``off`` of the forward gene."""
    return CDS[off]


class TestLibraryForward:
    def test_translate(self):
        assert cq.translate(CDS) == "M" + "A" * 7 + "W" * 7 + "E*"

    def test_synonymous(self):
        # codon 2 GCT(Ala) at genomic 113-115; GCT->GCC still Ala: change 115 T->C
        assert cq.classify(fwd_tx(), 115, "T", "C") == ["synonymous_variant"]

    def test_missense(self):
        # GCT->GTT (A->V): genomic 114 C->T
        assert cq.classify(fwd_tx(), 114, "C", "T") == ["missense_variant"]

    def test_stop_gained(self):
        # TGG(W)->TGA(*): third base of a W codon. W codons start at CDS
        # offset 24 (8th codon). offsets 24..26 → genomic: offset<20 in exon1
        # (110+o), else exon2 170+(o-20). o=26 → 176. G->A gives TGA.
        assert cq.classify(fwd_tx(), 176, "G", "A") == ["stop_gained"]

    def test_stop_lost(self):
        # stop codon TAA at CDS offsets 48-50 → genomic 170+28..30=198..200
        assert cq.classify(fwd_tx(), 198, "T", "C") == ["stop_lost"]

    def test_stop_retained(self):
        # TAA->TAG still stop: genomic 200 A->G
        assert cq.classify(fwd_tx(), 200, "A", "G") == ["stop_retained_variant"]

    def test_start_lost(self):
        # ATG start at genomic 110-112; A->G
        assert cq.classify(fwd_tx(), 110, "A", "G") == ["start_lost"]

    def test_frameshift(self):
        assert cq.classify(fwd_tx(), 114, "C", "") == ["frameshift_variant"]
        assert cq.classify(fwd_tx(), 114, "", "CT") == ["frameshift_variant"]

    def test_inframe(self):
        assert cq.classify(fwd_tx(), 114, "", "CTG") == ["inframe_insertion"]
        assert cq.classify(fwd_tx(), 114, "CTG", "") == ["inframe_deletion"]

    def test_utr(self):
        assert cq.classify(fwd_tx(), 105, "A", "T") == ["5_prime_UTR_variant"]
        assert cq.classify(fwd_tx(), 210, "A", "T") == ["3_prime_UTR_variant"]

    def test_intron_deep(self):
        assert cq.classify(fwd_tx(), 150, "A", "T") == ["intron_variant"]

    def test_splice_donor(self):
        # intron 130-169; donor = 130-131 on + strand.  VEP's intron-body
        # check excludes the 2bp splice sites, so no intron_variant here
        # (reference intron_variant_not_emitted_at_splice_donor_position,
        # transcript_consequence.rs:11213)
        got = cq.classify(fwd_tx(), 130, "G", "A")
        assert "splice_donor_variant" in got and "intron_variant" not in got

    def test_splice_acceptor(self):
        got = cq.classify(fwd_tx(), 169, "G", "A")
        assert "splice_acceptor_variant" in got

    def test_splice_donor_5th(self):
        # the 5th-base term subsumes both donor-region and splice_region
        # (VEP splice_region predicate returns 0 when a more specific splice
        # term fires; reference strip_parent_terms)
        got = cq.classify(fwd_tx(), 134, "A", "T")
        assert "splice_donor_5th_base_variant" in got
        assert "splice_region_variant" not in got
        assert "splice_donor_region_variant" not in got
        assert "intron_variant" in got

    def test_polypyrimidine(self):
        # acceptor-side 3-17 intronic: 169-16 .. 169-2 = 153..167
        got = cq.classify(fwd_tx(), 160, "T", "C")
        assert got == ["splice_polypyrimidine_tract_variant", "intron_variant"]

    def test_exonic_splice_region(self):
        # last 3 bases of exon1 (127-129)
        got = cq.classify(fwd_tx(), 128, "C", "G")
        assert "splice_region_variant" in got

    def test_upstream_downstream(self):
        assert cq.classify(fwd_tx(), 50, "A", "T") == ["upstream_gene_variant"]
        assert cq.classify(fwd_tx(), 400, "A", "T") == ["downstream_gene_variant"]
        assert cq.classify(fwd_tx(), 6000, "A", "T") == []  # beyond both windows

    def test_noncoding(self):
        # VEP omits the parent non_coding_transcript_variant when the more
        # specific exon term is present (reference
        # non_coding_exon_and_intron_terms, transcript_consequence.rs:9737)
        t = fwd_tx(biotype="lincRNA", cds_start=None, cds_end=None, cds_sequence=None)
        assert cq.classify(t, 115, "T", "C") == ["non_coding_transcript_exon_variant"]
        # intronic: intron_variant + the parent term
        got = cq.classify(t, 150, "A", "T")
        assert got == ["intron_variant", "non_coding_transcript_variant"]

    def test_nmd(self):
        t = fwd_tx(biotype="nonsense_mediated_decay")
        got = cq.classify(t, 150, "A", "T")
        assert "NMD_transcript_variant" in got and "intron_variant" in got

    def test_most_severe(self):
        assert cq.most_severe(["intron_variant", "splice_donor_variant"]) == (
            "splice_donor_variant"
        )
        assert cq.most_severe([]) is None


class TestLibraryReverse:
    def test_reverse_synonymous_missense(self):
        # On minus strand CDS offset o maps to genomic: first 31 CDS bases in
        # exon2 (200 down to 170), rest in exon1 (129 down to 110).
        # codon2 GCT at CDS offsets 3..5 → genomic 197,196,195.
        # GCT->GCC: CDS base 5 T->C ⇒ genomic 195 plus-strand A->G.
        assert cq.classify(rev_tx(), 195, "A", "G") == ["synonymous_variant"]
        # GCT->GTT: CDS base 4 C->T ⇒ genomic 196 G->A
        assert cq.classify(rev_tx(), 196, "G", "A") == ["missense_variant"]

    def test_reverse_start_lost(self):
        # ATG at CDS 0..2 → genomic 200,199,198; A at genomic 200 is
        # plus-strand T.  T->C kills the start (ATG->GTG is A->G on minus =
        # T->C on plus at 200).
        assert cq.classify(rev_tx(), 200, "T", "C") == ["start_lost"]

    def test_reverse_splice_orientation(self):
        # minus strand: donor side of intron 130-169 is at the high end
        got = cq.classify(rev_tx(), 169, "G", "A")
        assert "splice_donor_variant" in got
        got = cq.classify(rev_tx(), 130, "G", "A")
        assert "splice_acceptor_variant" in got

    def test_reverse_updown(self):
        assert cq.classify(rev_tx(), 300, "A", "T") == ["upstream_gene_variant"]
        assert cq.classify(rev_tx(), 90, "A", "T") == ["downstream_gene_variant"]

    def test_reverse_utr(self):
        # genomic 210 > cds_end: 5' side on minus strand
        assert cq.classify(rev_tx(), 210, "A", "T") == ["5_prime_UTR_variant"]
        assert cq.classify(rev_tx(), 105, "A", "T") == ["3_prime_UTR_variant"]


class TestHGVS:
    def test_g(self):
        assert cq.hgvs_g("chr1", 114, "C", "T") == "chr1:g.114C>T"
        assert cq.hgvs_g("chr1", 114, "CT", "") == "chr1:g.114_115del"
        assert cq.hgvs_g("chr1", 114, "", "GG") == "chr1:g.114_115insGG"
        assert cq.hgvs_g("chr1", 114, "CT", "AA") == "chr1:g.114_115delinsAA"

    def test_c_forward(self):
        # genomic 114 = CDS offset 4 → c.5
        assert cq.hgvs_c(fwd_tx(), 114, "C", "T") == "T1:c.5C>T"

    def test_c_exon2(self):
        # genomic 176 = CDS offset 26 → c.27
        assert cq.hgvs_c(fwd_tx(), 176, "G", "A") == "T1:c.27G>A"

    def test_p(self):
        assert cq.hgvs_p(fwd_tx(), 114, "C", "T") == "T1:p.Ala2Val"
        assert cq.hgvs_p(fwd_tx(), 115, "T", "C") == "T1:p.Ala2="
        assert cq.hgvs_p(fwd_tx(), 176, "G", "A") == "T1:p.Trp9Ter"

    def test_p_reverse(self):
        assert cq.hgvs_p(rev_tx(), 196, "G", "A") == "T2:p.Ala2Val"


@pytest.fixture(scope="module")
def vep_frames(spark):
    vcf = spark.createDataFrame(
        [
            ("chr1", 114, 114, "C", "T"),     # missense
            ("chr1", 115, 115, "T", "C"),     # synonymous
            ("chr1", 150, 150, "A", "T"),     # intron
            ("chr1", 105, 105, "A", "T"),     # 5' UTR
            ("chr1", 50, 50, "A", "T"),       # upstream
            ("chr2", 999, 999, "G", "C"),     # intergenic (no transcript)
        ],
        "chrom string, start long, end long, ref string, alt string",
    )
    cache = spark.createDataFrame(
        [("chr1", 114, 114, "rs1", "C/T", "pathogenic")],
        "chrom string, start long, end long, variation_name string, "
        "allele_string string, clin_sig string",
    )
    tx = spark.createDataFrame(
        [("T1", "chr1", 100, 219, 1, "protein_coding", "G1", "GENE1", 110, 200, CDS)],
        "transcript_id string, chrom string, start long, end long, strand int, "
        "biotype string, gene_stable_id string, gene_symbol string, "
        "cds_start long, cds_end long, cds_sequence string",
    )
    ex = spark.createDataFrame(
        [("T1", 100, 129), ("T1", 170, 219)],
        "transcript_id string, start long, end long",
    )
    return vcf, cache, tx, ex


class TestAnnotateVepCodon:
    def test_end_to_end(self, spark, vep_frames):
        vcf, cache, tx, ex = vep_frames
        out = annotate_vep(vcf, cache, transcripts=tx, exons=ex).collect()
        by_pos = {(r.chrom, r.start): r for r in out}
        assert len(out) == 6

        r = by_pos[("chr1", 114)]
        assert r.most_severe_consequence == "missense_variant"
        assert r.existing_variation == "rs1"
        # full-width 74-field entry (VEP_CSQ_FIELDS): transcript span,
        # per-variant existing/CLIN_SIG splice, empty unsourced slots
        f = r.CSQ.split("|")
        assert len(f) == 74
        assert f[:8] == [
            "T", "missense_variant", "MODERATE", "GENE1", "G1",
            "Transcript", "T1", "protein_coding",
        ]
        assert f[8] == "1/2"              # EXON
        assert f[10] == "T1:c.5C>T" and f[11] == "T1:p.Ala2Val"
        assert f[12:17] == ["15", "5", "2", "A/V", "gCt/gTt"]
        assert f[17] == "rs1"             # Existing_variation splice
        assert f[19] == "1"               # STRAND
        assert f[29] == "SNV"             # VARIANT_CLASS
        assert f[70] == "pathogenic"      # CLIN_SIG
        assert r.matched is True
        # typed columns of the most-severe transcript entry
        assert (r.impact, r.gene_symbol, r.gene_stable_id, r.feature) == (
            "MODERATE", "GENE1", "G1", "T1"
        )
        assert r.biotype == "protein_coding"
        assert r.hgvsc == "T1:c.5C>T" and r.hgvsp == "T1:p.Ala2Val"
        assert r.consequence_terms == ["missense_variant"]
        ig0 = by_pos[("chr2", 999)]
        assert ig0.impact == "MODIFIER" and ig0.feature is None

        assert by_pos[("chr1", 115)].most_severe_consequence == "synonymous_variant"
        assert by_pos[("chr1", 150)].most_severe_consequence == "intron_variant"
        assert by_pos[("chr1", 105)].most_severe_consequence == "5_prime_UTR_variant"
        assert by_pos[("chr1", 50)].most_severe_consequence == "upstream_gene_variant"

        ig = by_pos[("chr2", 999)]
        assert ig.most_severe_consequence == "intergenic_variant"
        igf = ig.CSQ.split("|")
        assert len(igf) == 74
        assert igf[:3] == ["C", "intergenic_variant", "MODIFIER"]
        assert igf[29] == "SNV" and all(x == "" for i, x in enumerate(igf[3:]) if i + 3 != 29)
        assert ig.matched is False

    def test_multi_transcript_rollup(self, spark, vep_frames):
        vcf, cache, tx, ex = vep_frames
        tx2 = tx.unionByName(
            spark.createDataFrame(
                [("T9", "chr1", 100, 219, 1, "lincRNA", "G9", "GENE9", None, None, None)],
                tx.schema,
            )
        )
        out = annotate_vep(vcf, cache, transcripts=tx2, exons=ex)
        r = {(x.chrom, x.start): x for x in out.collect()}[("chr1", 114)]
        # two CSQ entries, most severe across both transcripts is missense
        assert r.most_severe_consequence == "missense_variant"
        assert len(r.CSQ.split(",")) == 2

    def test_mature_mirna_regions_plumbed(self, spark, vep_frames):
        # miRNA transcript with a mature region column: a variant inside the
        # region rolls up to mature_miRNA_variant (reference
        # transcript_consequence.rs:11108 semantics through the Spark seam)
        vcf, cache, _, _ = vep_frames
        tx = spark.createDataFrame(
            [("M1", "chr1", 100, 219, 1, "miRNA", "G1", "GENE1", None, None,
              None, [(110, 130)])],
            "transcript_id string, chrom string, start long, end long, "
            "strand int, biotype string, gene_stable_id string, "
            "gene_symbol string, cds_start long, cds_end long, "
            "cds_sequence string, mature_mirna_regions array<struct<s:long,e:long>>",
        )
        out = annotate_vep(vcf, cache, transcripts=tx)
        r = {(x.chrom, x.start): x for x in out.collect()}
        assert r[("chr1", 114)].most_severe_consequence == "mature_miRNA_variant"
        assert r[("chr1", 150)].most_severe_consequence == (
            "non_coding_transcript_exon_variant"
        )

    def test_positional_engine_still_works(self, spark, vep_frames):
        vcf, cache, tx, _ = vep_frames
        out = annotate_vep(vcf, cache, transcripts=tx, engine="positional")
        r = {(x.chrom, x.start): x for x in out.collect()}[("chr1", 114)]
        assert r.most_severe_consequence == "coding_transcript_variant"


class TestHGVSExtensions:
    """3'-shifting, dup detection, rev-strand spans, frameshift/extension."""

    def test_c_del_3prime_shift(self):
        # delete one GCT from the 7×GCT run (CDS offsets 3-23): the 3' rule
        # rolls the deletion to the last repeat copy → c.22_24del
        assert cq.hgvs_c(fwd_tx(), 113, "GCT", "") == "T1:c.22_24del"

    def test_c_ins_dup(self):
        # insert GCT inside the run → insertion point 3'-shifts to the run
        # end; the dup names the MOST-3' existing copy (published HGVS
        # 3'-rule; same span as the shifted deletion of one copy)
        assert cq.hgvs_c(fwd_tx(), 115, "", "GCT") == "T1:c.22_24dup"

    def test_c_del_reverse_span(self):
        # minus strand: genomic [195,196] = transcript CDS offsets 4-5
        assert cq.hgvs_c(rev_tx(), 195, "AG", "") == "T2:c.5_6del"

    def test_p_inframe_del(self):
        assert cq.hgvs_p(fwd_tx(), 113, "GCT", "") == "T1:p.Ala8del"

    def test_p_inframe_ins(self):
        # inserted Ala equals the residue immediately 5' → duplication
        # notation (hgvs.rs test_format_hgvsp_insertion_duplication)
        assert cq.hgvs_p(fwd_tx(), 115, "", "GCT") == "T1:p.Ala8dup"

    def test_p_frameshift(self):
        import re

        got = cq.hgvs_p(fwd_tx(), 113, "G", "")
        assert got is not None and re.fullmatch(r"T1:p\.Ala2\w{3}fsTer(\d+|\?)", got), got

    def test_p_stop_change(self):
        # TAA stop at CDS 48-50 (genomic 198-200); 199 A>C → TCA = Ser:
        # stop-lost → extension notation; no downstream sequence in this
        # context → unknown new-stop distance (hgvs.rs
        # test_format_hgvsp_stop_lost_adds_extension_length)
        assert cq.hgvs_p(fwd_tx(), 199, "A", "C") == "T1:p.Ter17SerextTer?"

    def test_c_utr_and_intronic_coordinates(self):
        # published HGVS UTR / intron-offset coordinates (VEP emits HGVSc
        # for every intronic variant): exon1 ends at c.20, exon2 starts c.21
        assert cq.hgvs_c(fwd_tx(), 105, "A", "T") == "T1:c.-5A>T"       # 5' UTR
        assert cq.hgvs_c(fwd_tx(), 210, "A", "T") == "T1:c.*10A>T"      # 3' UTR
        assert cq.hgvs_c(fwd_tx(), 134, "A", "T") == "T1:c.20+5A>T"     # donor side
        assert cq.hgvs_c(fwd_tx(), 150, "A", "T") == "T1:c.21-20A>T"    # acceptor side
        assert cq.hgvs_c(fwd_tx(), 134, "AT", "") == "T1:c.20+5_20+6del"
        # minus strand: genomic 150 is transcript-near the exon at 170..200
        # (c.31 is the last base of the transcript-first exon on T2)
        got = cq.hgvs_c(rev_tx(), 150, "A", "T")
        assert got is not None and got.startswith("T2:c.31")


# ---------------------------------------------------------------------------
# typed annotation details (annotate_provider.rs transcript-level columns)
# ---------------------------------------------------------------------------


def _tx_two_exons(strand=1, cds=True, seq=None):
    from datafusion_bio_functions_spark.functions import consequence as cq

    return cq.Transcript(
        transcript_id="TXD", chrom="1", start=1000, end=1600, strand=strand,
        biotype="protein_coding",
        exons=[(1000, 1250), (1350, 1600)],
        cds_start=1100 if cds else None, cds_end=1500 if cds else None,
        cds_sequence=seq,
    )


def test_variant_class():
    from datafusion_bio_functions_spark.functions.consequence import variant_class

    assert variant_class("A", "G") == "SNV"
    assert variant_class("", "GG") == "insertion"
    assert variant_class("A", "AGG") == "insertion"
    assert variant_class("AG", "") == "deletion"
    assert variant_class("AGG", "A") == "deletion"
    assert variant_class("AG", "GT") == "substitution"
    assert variant_class("AGT", "CA") == "indel"


def test_exon_intron_numbers_strands():
    from datafusion_bio_functions_spark.functions.consequence import exon_intron_numbers

    t = _tx_two_exons(strand=1)
    assert exon_intron_numbers(t, 1100, 1100) == ("1/2", None)
    assert exon_intron_numbers(t, 1400, 1400) == ("2/2", None)
    assert exon_intron_numbers(t, 1300, 1300) == (None, "1/1")
    tm = _tx_two_exons(strand=-1)
    assert exon_intron_numbers(tm, 1100, 1100) == ("2/2", None)
    assert exon_intron_numbers(tm, 1400, 1400) == ("1/2", None)
    assert exon_intron_numbers(tm, 1300, 1300) == (None, "1/1")


def test_annotation_details_positions():
    from datafusion_bio_functions_spark.functions.consequence import annotation_details

    t = _tx_two_exons(strand=1)
    # sequence-less transcript, DEFAULT ('reference') mode: cds/protein
    # positions are None (the reference derives them only from a coding
    # classification, which needs a translation); cdna stays geometric
    d = annotation_details(t, 1102, "A", "G")
    assert (d["cdna_position"], d["cds_position"], d["protein_position"]) == (103, None, None)
    # 'geometric' compat keeps the historical exon-geometry positions
    d = annotation_details(t, 1102, "A", "G", seqless_positions="geometric")
    # cdna: exon1 offset 102 → 103; cds: 1102-1100=2 → 3; protein codon 1
    assert (d["cdna_position"], d["cds_position"], d["protein_position"]) == (103, 3, 1)
    d2 = annotation_details(t, 1400, "A", "G", seqless_positions="geometric")
    # cdna: 251 + (1400-1350) = 301 → 302; cds: 151 + 50 = 201 → 202; aa 68
    assert (d2["cdna_position"], d2["cds_position"], d2["protein_position"]) == (302, 202, 68)
    # minus strand mirrors: spliced total 502, cds total 302
    tm = _tx_two_exons(strand=-1)
    dm = annotation_details(tm, 1102, "A", "G", seqless_positions="geometric")
    assert dm["cdna_position"] == 502 - 102  # 400
    assert dm["cds_position"] == 302 - 2     # 300
    # intronic: no positions, intron set
    di = annotation_details(t, 1300, "A", "G")
    assert di["intron"] == "1/1" and di["cds_position"] is None
    # upstream: only distance
    du = annotation_details(t, 900, "A", "G")
    assert du["distance"] == 100 and du["exon"] is None


def test_annotation_details_codons_amino_acids():
    from datafusion_bio_functions_spark.functions.consequence import annotation_details

    # CDS: ATG GCT TAA (M A *)
    t = _tx_two_exons(strand=1, seq=None)
    t.cds_start, t.cds_end = 1100, 1108
    t.cds_sequence = "ATGGCTTAA"
    d = annotation_details(t, 1103, "G", "A")  # GCT→ACT: A→T missense
    assert d["codons"] == "Gct/Act"
    assert d["amino_acids"] == "A/T"
    # synonymous: GCT→GCC both Ala
    d2 = annotation_details(t, 1105, "T", "C")
    assert d2["codons"] == "gcT/gcC"
    assert d2["amino_acids"] == "A"


class TestAnnotateVepIndelPipeline:
    def test_vcf_padded_inframe_deletion_end_to_end(self, spark, vep_frames):
        # VCF-anchored deletion G(GCT)>G at 112: the pipeline normalizes to
        # the GCT deletion at 113-115 (codon 2), classifies inframe, and
        # renders the reference's codon/amino-acid conventions
        _, cache, tx, ex = vep_frames
        vcf = spark.createDataFrame(
            [("chr1", 112, 115, "GGCT", "G")],
            "chrom string, start long, end long, ref string, alt string",
        )
        r = annotate_vep(
            vcf, cache, transcripts=tx, exons=ex, full_schema=True
        ).collect()[0]
        assert r.most_severe_consequence == "inframe_deletion"
        assert r.Codons == "GCT/-"
        assert r.Amino_acids == "A/-"
        assert r.Protein_position == "2"
        assert r.VARIANT_CLASS == "deletion"
        assert r.HGVSc is not None and r.HGVSc.endswith("del")

    def test_vcf_padded_frameshift_insertion_end_to_end(self, spark, vep_frames):
        _, cache, tx, ex = vep_frames
        vcf = spark.createDataFrame(
            [("chr1", 113, 113, "G", "GTT")],
            "chrom string, start long, end long, ref string, alt string",
        )
        r = annotate_vep(vcf, cache, transcripts=tx, exons=ex).collect()[0]
        assert r.most_severe_consequence == "frameshift_variant"
        assert r.hgvsp is not None and "fs" in r.hgvsp


class TestSequenceContextPipeline:
    def test_spliced_seq_column_drives_cdna_start_check_end_to_end(self, spark):
        """Transcripts carrying spliced_seq / cdna_coding_start / _end feed
        the cDNA-space ins_del_start_altered through the operator: the
        issue-125 frameshift deletion preserving ATG co-fires
        start_retained_variant AND start_lost (reference
        transcript_consequence.rs:15095-15133)."""
        # 5'UTR GCGC at 1000-1003, CDS ATGGCTGAATGA at 1004-1015
        tx = spark.createDataFrame(
            [(
                "T1", "chr9", 1000, 1015, 1, "protein_coding", "G1", "S1",
                1004, 1015, "ATGGCTGAATGA", "GCGCATGGCTGAATGA", 5, 16,
            )],
            "transcript_id string, chrom string, start long, end long, "
            "strand int, biotype string, gene_stable_id string, "
            "gene_symbol string, cds_start long, cds_end long, "
            "cds_sequence string, spliced_seq string, "
            "cdna_coding_start long, cdna_coding_end long",
        )
        ex = spark.createDataFrame(
            [("T1", 1000, 1015)], "transcript_id string, start long, end long"
        )
        cache = spark.createDataFrame(
            [("chr9", 1, 1, "rs0", "A/T")],
            "chrom string, start long, end long, variation_name string, "
            "allele_string string",
        )
        # VCF-anchored AG>A at 1005 = deletion of G at CDS pos 2 (frameshift
        # preserving ATG in cDNA space)
        vcf = spark.createDataFrame(
            [("chr9", 1005, 1006, "AG", "A")],
            "chrom string, start long, end long, ref string, alt string",
        )
        row = annotate_vep(vcf, cache, transcripts=tx, exons=ex).collect()[0]
        terms = set(row.consequence_terms)
        assert "start_retained_variant" in terms
        assert "start_lost" in terms
        # frameshift_variant outranks start_lost in the SO severity order
        assert row.most_severe_consequence == "frameshift_variant"
