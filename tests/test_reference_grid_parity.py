"""Differential-grid parity replay: the reference implementation's own
outputs over a 9102-pair grid, pinned as a fixture.

``fixtures/refgrid/ref_out.jsonl.gz`` was produced in round 9 by compiling
the reference's ``hgvs.rs`` + ``transcript_consequence.rs`` standalone
(external crates stubbed) and running its ``TranscriptConsequenceEngine``
over ``gen_grid.py``'s grid: 6 synthetic transcripts (± strand,
protein_coding/lincRNA, 2-exon/single-exon, with/without sequences) ×
1517 VCF-style variants (dense SNVs, 1–3 bp insertions/deletions, MNVs,
up/downstream sampling), with FASTA-derived genomic 3'-shift state built
from the same synthetic genome on both sides.

This test replays OUR engine over the identical grid with the pipeline's
own per-pair calls (operators/vep.py:1613-1634) and compares every field
the reference's ``TranscriptConsequence`` carries: the full SO-term list,
EXON/INTRON strings, cDNA/CDS/protein position strings, Amino_acids,
Codons, DISTANCE, HGVSc, HGVSp.

Documented exclusions:
* ``known_tail.json``: boundary-shaped residuals (exon/intron-spanning
  MNV/deletion codon fields, insertions at the transcript's last base,
  insertions adjacent to an internal-stop codon — an artifact of the
  random-sequence grid where ENSTB's protein begins with a stop).  Each
  entry lists the exact (pos, ref, alt, tx) and fields; the test FAILS if
  a whitelisted row starts matching (so parity improvements must shrink
  the whitelist) or if any non-whitelisted row diverges.
"""

from __future__ import annotations

import gzip
import json
import os

import pytest

import datafusion_bio_functions_spark.functions.alleles as al
import datafusion_bio_functions_spark.functions.consequence as cq

FIX = os.path.join(os.path.dirname(__file__), "fixtures", "refgrid")

FIELDS = [
    "terms", "exon", "intron", "cdna", "cds", "protein",
    "aa", "codons", "distance", "hgvsc", "hgvsp",
]


def _transcripts():
    txs = []
    for line in open(os.path.join(FIX, "transcripts.tsv")):
        f = line.rstrip("\n").split("\t")
        exons = [tuple(map(int, seg.split("-"))) for seg in f[10].split(";")]
        txs.append(
            cq.Transcript(
                transcript_id=f[0], chrom=f[1], start=int(f[2]), end=int(f[3]),
                strand=int(f[4]), biotype=f[5],
                cds_start=int(f[6]) if f[6] else None,
                cds_end=int(f[7]) if f[7] else None,
                cdna_coding_start=int(f[8]) if f[8] else None,
                cdna_coding_end=int(f[9]) if f[9] else None,
                exons=exons,
                spliced_seq=f[11] or None,
                cds_sequence=f[12] or None,
                translation_seq=f[13] or None,
                translation_seq_canonical=f[13] or None,
                cds_sequence_canonical=f[12] or None,
                translation_stable_id=(f"NP_{f[0]}" if f[12] else None),
            )
        )
    return txs


@pytest.mark.slow
def test_reference_grid_parity():
    genome = open(os.path.join(FIX, "genome.txt")).read().strip()

    def fetch(chrom, s, e):
        return genome[s - 1 : e]

    expected = {}
    with gzip.open(os.path.join(FIX, "ref_out.jsonl.gz"), "rt") as fh:
        for line in fh:
            r = json.loads(line)
            expected[(r["pos"], r["ref"], r["alt"], r["tx"])] = r

    tail = {
        tuple(e["key"]): set(e["fields"])
        for e in json.load(open(os.path.join(FIX, "known_tail.json")))
    }

    txs = _transcripts()
    got = {}
    for line in open(os.path.join(FIX, "variants.tsv")):
        f = line.rstrip("\n").split("\t")
        pos, ref, alt = int(f[1]), f[3], f[4]
        sh_f = sh_r = None
        if len(ref) != len(alt):
            vr, va = al.vcf_to_vep_allele(ref, alt)
            vs = al.vep_norm_start(pos, ref, alt)
            ve = al.vep_norm_end(pos, ref, alt)
            sh_f = cq.build_hgvs_genomic_shift(fetch, "1", vr, va, vs, ve, 1)
            sh_r = cq.build_hgvs_genomic_shift(fetch, "1", vr, va, vs, ve, -1)
        for t in txs:
            sh = sh_f if t.strand >= 0 else sh_r
            terms = cq.classify(t, pos, ref, alt, 5000, 5000)
            if not terms:
                continue
            det = cq.annotation_details(t, pos, ref, alt)
            got[(pos, ref, alt, t.transcript_id)] = {
                "terms": sorted(terms),
                "exon": det["exon"], "intron": det["intron"],
                "cdna": det["cdna_position_str"],
                "cds": det["cds_position_str"],
                "protein": det["protein_position_str"],
                "aa": det["amino_acids"], "codons": det["codons"],
                "distance": det["distance"],
                "hgvsc": cq.hgvs_c(t, pos, ref, alt, shift=sh),
                "hgvsp": (
                    cq.protein_hgvs_for_output(
                        t, pos, ref, alt, sh, terms, shift_hgvs=True
                    )
                    if t.cds_sequence is not None
                    else None
                ),
            }

    # row coverage must be identical (same transcripts hit per variant)
    assert set(expected) == set(got)

    unexpected = {}
    healed = {}
    for k in sorted(expected):
        for fld in FIELDS:
            same = expected[k][fld] == got[k][fld]
            if k in tail and fld in tail[k]:
                if same:
                    healed.setdefault(k, []).append(fld)
                continue
            if not same:
                unexpected.setdefault(k, []).append(
                    (fld, expected[k][fld], got[k][fld])
                )
    assert not unexpected, (
        f"{len(unexpected)} rows diverged from the reference grid: "
        f"{dict(list(unexpected.items())[:5])}"
    )
    assert not healed, (
        "whitelisted rows now MATCH the reference — parity improved; "
        f"remove them from known_tail.json: {dict(list(healed.items())[:10])}"
    )


def _transcripts_ext():
    txs = []
    for line in open(os.path.join(FIX, "transcripts2.tsv")):
        f = line.rstrip("\n").split("\t")
        exons = [tuple(map(int, seg.split("-"))) for seg in f[10].split(";")]
        edits = [
            cq.RefSeqEdit(*[int(x) for x in e.split("-")])
            for e in f[17].split(";")
            if e
        ]
        segs = []
        if len(f) > 20 and f[20]:
            for e in f[20].split(";"):
                p = [int(x) for x in e.split("-")]
                segs.append(cq.MapperSegment(p[0], p[1], p[2], p[3], p[4]))
        t = cq.Transcript(
            transcript_id=f[0], chrom=f[1], start=int(f[2]), end=int(f[3]),
            strand=int(f[4]), biotype=f[5],
            cds_start=int(f[6]), cds_end=int(f[7]),
            cdna_coding_start=int(f[8]), cdna_coding_end=int(f[9]),
            exons=exons, spliced_seq=f[11], cds_sequence=f[12],
            translation_seq=f[13],
            source=f[14] or None, bam_edit_status=f[15] or None,
            has_non_polya_rna_edit=(f[16] == "1"),
            cds_sequence_canonical=f[18] or None,
            translation_seq_canonical=f[19] or None,
            translation_stable_id=f"NP_{f[0]}",
        )
        t.refseq_edits = edits
        if segs:
            t.cdna_mapper_segments = segs
        txs.append(t)
    return txs


@pytest.mark.slow
def test_reference_grid_parity_refseq_edited():
    """Extension grid: NM_-style transcripts carrying an RNA-edit 3-base
    insertion (NM_G.1) and the same edit expressed as explicit cdna mapper
    segments (NM_H.1), over the identical 1517-variant set.  The reference
    implementation PANICS (slice out of range, classify_coding_change) on
    the insertion at the CDS-end base of the edited transcript — that
    variant is excluded (``known_tail2.json['panics']``) and stands as a
    documented reference crash this engine handles.  the residual rows whitelisted in known_tail2.json are
    documented (pre-transcript insertions the reference suppresses,
    CDS-end boundary deletions, insertions at the transcript's last base)."""
    genome = open(os.path.join(FIX, "genome.txt")).read().strip()

    def fetch(chrom, s, e):
        return genome[s - 1 : e]

    expected = {}
    with gzip.open(os.path.join(FIX, "ref_out2.jsonl.gz"), "rt") as fh:
        for line in fh:
            r = json.loads(line)
            expected[(r["pos"], r["ref"], r["alt"], r["tx"])] = r

    meta = json.load(open(os.path.join(FIX, "known_tail2.json")))
    panics = {tuple(p) for p in meta["panics"]}
    tail = {tuple(e["key"]): set(e["fields"]) for e in meta["tail"]}
    expected = {
        k: v
        for k, v in expected.items()
        if k[3] != "PANIC" and (k[0], k[1], k[2]) not in panics
    }

    txs = _transcripts_ext()
    got = {}
    for line in open(os.path.join(FIX, "variants.tsv")):
        f = line.rstrip("\n").split("\t")
        pos, ref, alt = int(f[1]), f[3], f[4]
        if (pos, ref, alt) in panics:
            continue
        sh_f = sh_r = None
        if len(ref) != len(alt):
            vr, va = al.vcf_to_vep_allele(ref, alt)
            vs = al.vep_norm_start(pos, ref, alt)
            ve = al.vep_norm_end(pos, ref, alt)
            sh_f = cq.build_hgvs_genomic_shift(fetch, "1", vr, va, vs, ve, 1)
            sh_r = cq.build_hgvs_genomic_shift(fetch, "1", vr, va, vs, ve, -1)
        for t in txs:
            sh = sh_f if t.strand >= 0 else sh_r
            terms = cq.classify(t, pos, ref, alt, 5000, 5000)
            if not terms:
                continue
            det = cq.annotation_details(t, pos, ref, alt)
            got[(pos, ref, alt, t.transcript_id)] = {
                "terms": sorted(terms),
                "exon": det["exon"], "intron": det["intron"],
                "cdna": det["cdna_position_str"],
                "cds": det["cds_position_str"],
                "protein": det["protein_position_str"],
                "aa": det["amino_acids"], "codons": det["codons"],
                "distance": det["distance"],
                "hgvsc": cq.hgvs_c(t, pos, ref, alt, shift=sh),
                "hgvsp": cq.protein_hgvs_for_output(
                    t, pos, ref, alt, sh, terms, shift_hgvs=True
                ),
            }

    assert set(expected) == set(got)
    unexpected = {}
    healed = {}
    for k in sorted(expected):
        for fld in FIELDS:
            same = expected[k][fld] == got[k][fld]
            if k in tail and fld in tail[k]:
                if same:
                    healed.setdefault(k, []).append(fld)
                continue
            if not same:
                unexpected.setdefault(k, []).append(
                    (fld, expected[k][fld], got[k][fld])
                )
    assert not unexpected, (
        f"{len(unexpected)} rows diverged: {dict(list(unexpected.items())[:5])}"
    )
    assert not healed, (
        "whitelisted rows now MATCH — shrink known_tail2.json: "
        f"{dict(list(healed.items())[:10])}"
    )


def _transcripts_grid3():
    txs = []
    for line in open(os.path.join(FIX, "transcripts3.tsv")):
        f = line.rstrip("\n").split("\t")
        exons = [tuple(map(int, seg.split("-"))) for seg in f[10].split(";")]
        t = cq.Transcript(
            transcript_id=f[0], chrom=f[1], start=int(f[2]), end=int(f[3]),
            strand=int(f[4]), biotype=f[5],
            cds_start=int(f[6]) if f[6] else None,
            cds_end=int(f[7]) if f[7] else None,
            cdna_coding_start=int(f[8]) if f[8] else None,
            cdna_coding_end=int(f[9]) if f[9] else None,
            exons=exons, spliced_seq=f[11] or None,
            cds_sequence=f[12] or None,
            translation_seq=f[13] or None,
            translation_stable_id=(f"NP_{f[0]}" if f[12] else None),
        )
        if len(f) > 21 and f[21]:
            t.mature_mirna_regions = [
                tuple(map(int, seg.split("-"))) for seg in f[21].split(";")
            ]
        if len(f) > 22:
            t.cds_start_nf = f[22] == "1"
        if len(f) > 23:
            t.cds_end_nf = f[23] == "1"
        txs.append(t)
    return txs


@pytest.mark.slow
def test_reference_grid_parity_biotype_arms():
    """Round-10 extension grid: the biotype / splice-edge / incomplete-CDS
    arms the round-9 grids did not cover — NMD and polymorphic_pseudogene
    biotypes, ± strand miRNA transcripts with mature regions
    (mature_miRNA_variant vs non_coding_transcript_exon_variant
    suppression), 10 bp FRAMESHIFT introns inside the CDS, cds_start_NF
    with leading-N phase padding, and cds_end_NF with an incomplete
    terminal codon — over the shared 1517-variant ladder; wave 4 added
    4-exon (three-intron) coding transcripts on both strands and the
    minus-strand incomplete-CDS twins (13 transcripts total).  The reference
    dump (ref_out3.jsonl.gz, produced by the same standalone build of the
    reference engine) also carries regulatory/motif/miRNA FEATURE rows
    (REG:*/MOTIF/'-'); those are compared operator-level in
    test_vep.py — this replay pins the transcript rows.  ZERO whitelist:
    every field of every row must match."""
    genome = open(os.path.join(FIX, "genome.txt")).read().strip()

    def fetch(chrom, s, e):
        return genome[s - 1 : e]

    expected = {}
    with gzip.open(os.path.join(FIX, "ref_out3.jsonl.gz"), "rt") as fh:
        for line in fh:
            r = json.loads(line)
            tx = r.get("tx")
            if tx is None or tx.startswith("REG:") or tx in ("MOTIF", "-"):
                continue  # feature rows: operator-level comparison
            expected[(r["pos"], r["ref"], r["alt"], tx)] = r

    txs = _transcripts_grid3()
    got = {}
    for line in open(os.path.join(FIX, "variants.tsv")):
        f = line.rstrip("\n").split("\t")
        pos, ref, alt = int(f[1]), f[3], f[4]
        sh_f = sh_r = None
        if len(ref) != len(alt):
            vr, va = al.vcf_to_vep_allele(ref, alt)
            vs = al.vep_norm_start(pos, ref, alt)
            ve = al.vep_norm_end(pos, ref, alt)
            sh_f = cq.build_hgvs_genomic_shift(fetch, "1", vr, va, vs, ve, 1)
            sh_r = cq.build_hgvs_genomic_shift(fetch, "1", vr, va, vs, ve, -1)
        for t in txs:
            sh = sh_f if t.strand >= 0 else sh_r
            terms = cq.classify(t, pos, ref, alt, 5000, 5000)
            if not terms:
                continue
            det = cq.annotation_details(t, pos, ref, alt)
            got[(pos, ref, alt, t.transcript_id)] = {
                "terms": sorted(terms),
                "exon": det["exon"], "intron": det["intron"],
                "cdna": det["cdna_position_str"],
                "cds": det["cds_position_str"],
                "protein": det["protein_position_str"],
                "aa": det["amino_acids"], "codons": det["codons"],
                "distance": det["distance"],
                "hgvsc": cq.hgvs_c(t, pos, ref, alt, shift=sh),
                "hgvsp": cq.protein_hgvs_for_output(
                    t, pos, ref, alt, sh, terms, shift_hgvs=True
                ),
            }

    assert set(expected) == set(got)
    unexpected = {}
    for k in sorted(expected):
        for fld in FIELDS:
            if expected[k][fld] != got[k][fld]:
                unexpected.setdefault(k, []).append(
                    (fld, expected[k][fld], got[k][fld])
                )
    assert not unexpected, (
        f"{len(unexpected)} rows diverged: {dict(list(unexpected.items())[:5])}"
    )
