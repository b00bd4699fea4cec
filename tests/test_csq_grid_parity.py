"""CSQ-STRING differential-grid replay (round 11): the reference's full
per-variant CSQ assembly — entry sort order (Transcript < RegulatoryFeature
< MotifFeature < None, then feature id), '&'-joined terms, IMPACT from the
entry's most severe term, the 74-field default ensembl layout, ENSP from
the translation stable id, regulatory feature_type as BIOTYPE, id-less
motif/miRNA feature entries, FASTA-backed HGVS 3'-shift, hgvsp output
escaping, and the most_severe rollup — diffed STRING-EQUAL per variant.

``fixtures/refgrid/ref_out4.jsonl.gz`` was produced by the same standalone
build of the reference engine as the other grids (see fixtures README)
extended with the reference's CSQ writer logic (``annotate_provider.rs``
:4156-4240 sorted permutation + most_severe, :4499-4513 default 74-field
arm, :4515-4527 placeholder, :5318-5337 impact/variant-class labels,
:2418-2449 hgvsp output transform), run over the COMBINED grid1+grid3
context (19 transcripts + grid-3 regulatory/motif/miRNA features) with
FASTA-derived genomic shift state from ``genome.txt`` — the reference's
only reachable HGVS mode (it refuses ``--hgvs`` without a FASTA,
``validate_hgvs_reference_fasta``).

This side runs the SHIPPING ``annotate_vep`` (codon engine) end-to-end —
Spark DataFrames in, CSQ strings out — with ``reference_genome`` supplying
the same FASTA bytes.  ZERO whitelist: every variant's full CSQ string and
most_severe_consequence must match byte-for-byte.
"""

from __future__ import annotations

import gzip
import json
import os

import pytest

FIX = os.path.join(os.path.dirname(__file__), "fixtures", "refgrid")


def _load_context(spark):
    from pyspark.sql import types as T

    tx_rows, ex_rows, tl_rows = [], [], []
    for path in (f"{FIX}/transcripts.tsv", f"{FIX}/transcripts3.tsv"):
        for line in open(path):
            f = line.rstrip("\n").split("\t")
            tid = f[0]
            for seg in f[10].split(";"):
                s, e = map(int, seg.split("-"))
                ex_rows.append((tid, s, e))
            mir = (
                [
                    {"s": int(seg.split("-")[0]), "e": int(seg.split("-")[1])}
                    for seg in f[21].split(";")
                ]
                if len(f) > 21 and f[21]
                else None
            )
            tx_rows.append(
                (
                    tid, f[1], int(f[2]), int(f[3]), int(f[4]), f[5],
                    int(f[6]) if f[6] else None, int(f[7]) if f[7] else None,
                    int(f[8]) if f[8] else None, int(f[9]) if f[9] else None,
                    f[11] or None, f[12] or None, mir,
                    len(f) > 22 and f[22] == "1", len(f) > 23 and f[23] == "1",
                )
            )
            if f[12]:
                tl_rows.append((tid, f[12], f[13] or None, f"NP_{tid}"))
    tx = spark.createDataFrame(
        tx_rows,
        T.StructType(
            [
                T.StructField("transcript_id", T.StringType()),
                T.StructField("chrom", T.StringType()),
                T.StructField("start", T.LongType()),
                T.StructField("end", T.LongType()),
                T.StructField("strand", T.IntegerType()),
                T.StructField("biotype", T.StringType()),
                T.StructField("cds_start", T.LongType(), True),
                T.StructField("cds_end", T.LongType(), True),
                T.StructField("cdna_coding_start", T.LongType(), True),
                T.StructField("cdna_coding_end", T.LongType(), True),
                T.StructField("spliced_seq", T.StringType(), True),
                T.StructField("cds_sequence", T.StringType(), True),
                T.StructField(
                    "mature_mirna_regions",
                    T.ArrayType(
                        T.StructType(
                            [
                                T.StructField("s", T.LongType()),
                                T.StructField("e", T.LongType()),
                            ]
                        )
                    ),
                    True,
                ),
                T.StructField("cds_start_nf", T.BooleanType()),
                T.StructField("cds_end_nf", T.BooleanType()),
            ]
        ),
    )
    ex = spark.createDataFrame(ex_rows, "transcript_id string, start long, end long")
    tl = spark.createDataFrame(
        tl_rows,
        "transcript_id string, cds_sequence string, translation_seq string, "
        "stable_id string",
    )
    reg_rows, mot_rows, mir_rows = [], [], []
    for line in open(f"{FIX}/features3.tsv"):
        f = line.rstrip("\n").split("\t")
        s, e = int(f[2]), int(f[3])
        if f[0] == "reg":
            reg_rows.append(("1", s, e, f[1], f[4] if len(f) > 4 and f[4] else None))
        elif f[0] == "motif":
            mot_rows.append(("1", s, e, f[1]))
        elif f[0] == "mirna":
            mir_rows.append(("1", s, e, f[1]))
    reg = spark.createDataFrame(
        reg_rows,
        "chrom string, start long, end long, feature_id string, feature_type string",
    )
    mot = spark.createDataFrame(
        mot_rows, "chrom string, start long, end long, feature_id string"
    )
    mirf = spark.createDataFrame(
        mir_rows, "chrom string, start long, end long, mirna_id string"
    )
    return tx, ex, tl, reg, mot, mirf


@pytest.mark.slow
def test_csq_string_grid_parity(spark):
    from datafusion_bio_functions_spark.operators.vep import annotate_vep

    tx, ex, tl, reg, mot, mirf = _load_context(spark)
    v_rows = []
    for line in open(f"{FIX}/variants.tsv"):
        f = line.rstrip("\n").split("\t")
        v_rows.append((f[0], int(f[1]), int(f[2]), f[3], f[4]))
    vcf = spark.createDataFrame(
        v_rows, "chrom string, start long, end long, ref string, alt string"
    )
    cache = spark.createDataFrame(
        [],
        "chrom string, start long, end long, variation_name string, "
        "allele_string string",
    )
    out = annotate_vep(
        vcf, cache, transcripts=tx, exons=ex, regulatory=reg, motifs=mot,
        mirnas=mirf, translations=tl,
        # a reference run without colocated-variant flags: the whole
        # Existing_variation / frequency block renders empty
        vep_options={},
        reference_genome={"1": open(f"{FIX}/genome.txt").read().strip()},
    )
    got = {
        (r["start"], r["ref"], r["alt"]): (r["most_severe_consequence"], r["CSQ"])
        for r in out.select(
            "start", "ref", "alt", "most_severe_consequence", "CSQ"
        ).collect()
    }

    expected = {}
    with gzip.open(f"{FIX}/ref_out4.jsonl.gz", "rt") as fh:
        for line in fh:
            r = json.loads(line)
            expected[(r["pos"], r["ref"], r["alt"])] = (r["most"], r["csq"])

    assert set(expected) == set(got)
    diverged = {
        k: {"ref": expected[k], "got": got[k]}
        for k in sorted(expected)
        if expected[k] != got[k]
    }
    assert not diverged, (
        f"{len(diverged)} variants diverged from the reference CSQ replay: "
        f"{dict(list(diverged.items())[:3])}"
    )


SIFT_PREDS = {
    0: "tolerated", 1: "deleterious",
    2: "tolerated - low confidence", 3: "deleterious - low confidence",
}
POLY_PREDS = {
    4: "benign", 5: "possibly damaging", 6: "probably damaging", 7: "unknown",
}


@pytest.mark.slow
def test_csq_everything_grid_parity(spark):
    """Grid 5: the ``--everything`` 80-field CSQ arm — per-entry SIFT /
    PolyPhen predictions from the relational prediction matrices
    (``sift5.tsv`` — the reference's CompactPrediction store semantics,
    ``kv_cache/sift_store.rs`` + ``lookup_sift_polyphen``,
    ``annotate_provider.rs:2111-2176``), DOMAINS from protein features
    (``lookup_domains`` incl. the insertion start/end swap), miRNA
    dot-bracket structure terms, HGVS_OFFSET from the FASTA shift, the
    generic MANE derivation, APPRIS abbreviation, CANONICAL / TSL / CCDS /
    UniProt metadata, and csq_escape on SWISSPROT/TREMBL — byte-equal per
    variant against the reference replay (``ref_out5.jsonl.gz``)."""
    from datafusion_bio_functions_spark.operators.vep import annotate_vep

    meta = {}
    for line in open(f"{FIX}/meta5.tsv"):
        f = line.rstrip("\n").split("\t")
        meta[f[0]] = f

    from pyspark.sql import types as T

    tx_rows, ex_rows, tl_rows = [], [], []
    for path in (f"{FIX}/transcripts.tsv", f"{FIX}/transcripts3.tsv"):
        for line in open(path):
            f = line.rstrip("\n").split("\t")
            tid = f[0]
            for seg in f[10].split(";"):
                s, e = map(int, seg.split("-"))
                ex_rows.append((tid, s, e))
            mir = (
                [
                    {"s": int(seg.split("-")[0]), "e": int(seg.split("-")[1])}
                    for seg in f[21].split(";")
                ]
                if len(f) > 21 and f[21]
                else None
            )
            m = meta[tid]
            tx_rows.append(
                (
                    tid, f[1], int(f[2]), int(f[3]), int(f[4]), f[5],
                    int(f[6]) if f[6] else None, int(f[7]) if f[7] else None,
                    int(f[8]) if f[8] else None, int(f[9]) if f[9] else None,
                    f[11] or None, f[12] or None, mir,
                    len(f) > 22 and f[22] == "1", len(f) > 23 and f[23] == "1",
                    m[1] == "1", int(m[2]) if m[2] else None, m[3] or None,
                    m[4] or None, m[5] or None, m[6] or None, m[7] or None,
                    m[8] or None, m[9] or None, m[10] or None, m[11] or None,
                    m[12] or None,
                )
            )
            if f[12]:
                tl_rows.append((tid, f[12], f[13] or None, f"NP_{tid}"))
    tx = spark.createDataFrame(
        tx_rows,
        T.StructType(
            [
                T.StructField("transcript_id", T.StringType()),
                T.StructField("chrom", T.StringType()),
                T.StructField("start", T.LongType()),
                T.StructField("end", T.LongType()),
                T.StructField("strand", T.IntegerType()),
                T.StructField("biotype", T.StringType()),
                T.StructField("cds_start", T.LongType(), True),
                T.StructField("cds_end", T.LongType(), True),
                T.StructField("cdna_coding_start", T.LongType(), True),
                T.StructField("cdna_coding_end", T.LongType(), True),
                T.StructField("spliced_seq", T.StringType(), True),
                T.StructField("cds_sequence", T.StringType(), True),
                T.StructField(
                    "mature_mirna_regions",
                    T.ArrayType(
                        T.StructType(
                            [
                                T.StructField("s", T.LongType()),
                                T.StructField("e", T.LongType()),
                            ]
                        )
                    ),
                    True,
                ),
                T.StructField("cds_start_nf", T.BooleanType()),
                T.StructField("cds_end_nf", T.BooleanType()),
                T.StructField("is_canonical", T.BooleanType()),
                T.StructField("tsl", T.IntegerType(), True),
                T.StructField("mane_select", T.StringType(), True),
                T.StructField("mane_plus_clinical", T.StringType(), True),
                T.StructField("appris", T.StringType(), True),
                T.StructField("ccds", T.StringType(), True),
                T.StructField("swissprot", T.StringType(), True),
                T.StructField("trembl", T.StringType(), True),
                T.StructField("uniparc", T.StringType(), True),
                T.StructField("uniprot_isoform", T.StringType(), True),
                T.StructField("gene_pheno", T.StringType(), True),
                T.StructField("ncrna_structure", T.StringType(), True),
            ]
        ),
    )
    ex = spark.createDataFrame(ex_rows, "transcript_id string, start long, end long")
    tl = spark.createDataFrame(
        tl_rows,
        "transcript_id string, cds_sequence string, translation_seq string, "
        "stable_id string",
    )
    sift_rows = []
    for line in open(f"{FIX}/sift5.tsv"):
        f = line.rstrip("\n").split("\t")
        sift_rows.append(
            (
                f[0], int(f[1]), f[2],
                SIFT_PREDS[int(f[3])], float(f[4]),
                POLY_PREDS[int(f[5])], float(f[6]),
            )
        )
    sift = spark.createDataFrame(
        sift_rows,
        "transcript_id string, protein_position long, alt_aa string, "
        "sift_prediction string, sift_score double, "
        "polyphen_prediction string, polyphen_score double",
    )
    dom_rows = []
    for line in open(f"{FIX}/domains5.tsv"):
        f = line.rstrip("\n").split("\t")
        dom_rows.append(
            (
                f[0], int(f[1]), int(f[2]), f[3] or None,
                f[4] if len(f) > 4 and f[4] else None,
            )
        )
    dom = spark.createDataFrame(
        dom_rows,
        "transcript_id string, start long, end long, analysis string, "
        "hseqname string",
    )
    _, _, _, reg, mot, mirf = _load_context(spark)

    v_rows = []
    for line in open(f"{FIX}/variants.tsv"):
        f = line.rstrip("\n").split("\t")
        v_rows.append((f[0], int(f[1]), int(f[2]), f[3], f[4]))
    vcf = spark.createDataFrame(
        v_rows, "chrom string, start long, end long, ref string, alt string"
    )
    cache = spark.createDataFrame(
        [],
        "chrom string, start long, end long, variation_name string, "
        "allele_string string",
    )
    out = annotate_vep(
        vcf, cache, transcripts=tx, exons=ex, regulatory=reg, motifs=mot,
        mirnas=mirf, translations=tl, sift=sift, domains=dom,
        csq_everything=True, vep_options={},
        reference_genome={"1": open(f"{FIX}/genome.txt").read().strip()},
    )
    got = {
        (r["start"], r["ref"], r["alt"]): (r["most_severe_consequence"], r["CSQ"])
        for r in out.select(
            "start", "ref", "alt", "most_severe_consequence", "CSQ"
        ).collect()
    }
    expected = {}
    with gzip.open(f"{FIX}/ref_out5.jsonl.gz", "rt") as fh:
        for line in fh:
            r = json.loads(line)
            expected[(r["pos"], r["ref"], r["alt"])] = (r["most"], r["csq"])
    assert set(expected) == set(got)
    diverged = {
        k: {"ref": expected[k], "got": got[k]}
        for k in sorted(expected)
        if expected[k] != got[k]
    }
    assert not diverged, (
        f"{len(diverged)} variants diverged from the --everything replay: "
        f"{dict(list(diverged.items())[:3])}"
    )


@pytest.mark.slow
@pytest.mark.parametrize(
    "mode,fixture,width",
    [("refseq", "ref_out6.jsonl.gz", 78), ("merged", "ref_out6m.jsonl.gz", 79)],
)
def test_csq_refseq_mode_grid_parity(spark, mode, fixture, width):
    """Grid 6: the refseq (78-field) and merged (79-field) CSQ provenance
    layouts over the grid-2 RefSeq-EDITED transcripts — the SOURCE slot
    replaced by (or joined with) the five-field REFSEQ_MATCH /
    [SOURCE] / REFSEQ_OFFSET / GIVEN_REF / USED_REF / BAM_EDIT splice
    (reference per-mode writer arms, annotate_provider.rs:4475-4498),
    byte-equal per variant against the reference replay.  Pins the
    shifted-deletion USED_REF rule (the protein-HGVS path's consumed
    shift reports the 3'-shifted deleted bases —
    shifted_deletion_uses_protein_hgvs_reference, transcript_
    consequence.rs:7459-7480), the edited-transcript reference allele,
    BAM_EDIT uppercasing, and the cumulative REFSEQ_OFFSET
    (refseq_misalignment_offset over the rna-edit deltas).  The one
    documented reference PANIC variant (known_tail2.json) is excluded,
    as in the grid-2 field replay."""
    from pyspark.sql import types as T

    from datafusion_bio_functions_spark.operators.vep import annotate_vep

    tx_rows, ex_rows, tl_rows = [], [], []
    for line in open(f"{FIX}/transcripts2.tsv"):
        f = line.rstrip("\n").split("\t")
        tid = f[0]
        for seg in f[10].split(";"):
            s, e = map(int, seg.split("-"))
            ex_rows.append((tid, s, e))
        edits = [
            {
                "start": int(p[0]), "end": int(p[1]),
                "replacement_len": int(p[2]), "skip_refseq_offset": False,
            }
            for p in (e.split("-") for e in f[17].split(";") if e)
        ] or None
        segs = [
            {
                "genomic_start": int(p[0]), "genomic_end": int(p[1]),
                "cdna_start": int(p[2]), "cdna_end": int(p[3]), "ori": int(p[4]),
            }
            for p in (
                e.split("-")
                for e in (f[20].split(";") if len(f) > 20 and f[20] else [])
            )
        ] or None
        tx_rows.append(
            (
                tid, f[1], int(f[2]), int(f[3]), int(f[4]), f[5],
                int(f[6]), int(f[7]), int(f[8]), int(f[9]),
                f[11] or None, f[12] or None,
                f[14] or None, f[15] or None, f[16] == "1", edits, segs,
            )
        )
        tl_rows.append(
            (tid, f[12], f[13] or None, f"NP_{tid}", f[18] or None, f[19] or None)
        )
    edits_t = T.ArrayType(
        T.StructType(
            [
                T.StructField("start", T.LongType()),
                T.StructField("end", T.LongType()),
                T.StructField("replacement_len", T.LongType()),
                T.StructField("skip_refseq_offset", T.BooleanType()),
            ]
        )
    )
    segs_t = T.ArrayType(
        T.StructType(
            [
                T.StructField("genomic_start", T.LongType()),
                T.StructField("genomic_end", T.LongType()),
                T.StructField("cdna_start", T.LongType()),
                T.StructField("cdna_end", T.LongType()),
                T.StructField("ori", T.IntegerType()),
            ]
        )
    )
    tx = spark.createDataFrame(
        tx_rows,
        T.StructType(
            [
                T.StructField("transcript_id", T.StringType()),
                T.StructField("chrom", T.StringType()),
                T.StructField("start", T.LongType()),
                T.StructField("end", T.LongType()),
                T.StructField("strand", T.IntegerType()),
                T.StructField("biotype", T.StringType()),
                T.StructField("cds_start", T.LongType()),
                T.StructField("cds_end", T.LongType()),
                T.StructField("cdna_coding_start", T.LongType()),
                T.StructField("cdna_coding_end", T.LongType()),
                T.StructField("spliced_seq", T.StringType(), True),
                T.StructField("cds_sequence", T.StringType(), True),
                T.StructField("source", T.StringType(), True),
                T.StructField("bam_edit_status", T.StringType(), True),
                T.StructField("has_non_polya_rna_edit", T.BooleanType()),
                T.StructField("refseq_edits", edits_t, True),
                T.StructField("cdna_mapper_segments", segs_t, True),
            ]
        ),
    )
    ex = spark.createDataFrame(ex_rows, "transcript_id string, start long, end long")
    tl = spark.createDataFrame(
        tl_rows,
        "transcript_id string, cds_sequence string, translation_seq string, "
        "stable_id string, cds_sequence_canonical string, "
        "translation_seq_canonical string",
    )
    panics = {tuple(p) for p in json.load(open(f"{FIX}/known_tail2.json"))["panics"]}
    v_rows = []
    for line in open(f"{FIX}/variants.tsv"):
        f = line.rstrip("\n").split("\t")
        if (int(f[1]), f[3], f[4]) in panics:
            continue
        v_rows.append((f[0], int(f[1]), int(f[2]), f[3], f[4]))
    vcf = spark.createDataFrame(
        v_rows, "chrom string, start long, end long, ref string, alt string"
    )
    cache = spark.createDataFrame(
        [],
        "chrom string, start long, end long, variation_name string, "
        "allele_string string",
    )
    out = annotate_vep(
        vcf, cache, transcripts=tx, exons=ex, translations=tl,
        csq_mode=mode, vep_options={},
        reference_genome={"1": open(f"{FIX}/genome.txt").read().strip()},
    )
    got = {
        (r["start"], r["ref"], r["alt"]): (r["most_severe_consequence"], r["CSQ"])
        for r in out.select(
            "start", "ref", "alt", "most_severe_consequence", "CSQ"
        ).collect()
    }
    expected = {}
    with gzip.open(f"{FIX}/{fixture}", "rt") as fh:
        for line in fh:
            r = json.loads(line)
            if r["most"] == "PANIC":
                continue
            expected[(r["pos"], r["ref"], r["alt"])] = (r["most"], r["csq"])
    assert set(expected) == set(got)
    for k, (_, csq) in got.items():
        for e in csq.split(","):
            assert len(e.split("|")) == width, (mode, k, len(e.split("|")))
    diverged = {
        k: {"ref": expected[k], "got": got[k]}
        for k in sorted(expected)
        if expected[k] != got[k]
    }
    assert not diverged, (
        f"{len(diverged)} variants diverged from the {mode}-mode replay: "
        f"{dict(list(diverged.items())[:3])}"
    )


@pytest.mark.slow
def test_csq_structural_variant_grid_parity(spark):
    """Grid 7: STRUCTURAL-VARIANT feature context (``features7.tsv`` = the
    grid-3 features + sv rows) through the full CSQ assembly — the
    reference's SV merge semantics (transcript_consequence.rs:1380-1770):
    regulatory-kind SV terms fuse INTO each overlapped regulatory entry
    ('&'-joined with regulatory_region_variant) or emit one standalone
    id-less RegulatoryFeature entry when no feature overlaps; TFBS-kind
    terms join the single id-less motif entry; transcript/generic-kind
    terms fuse into ONE default (rank-3) entry gated on the chromosome
    carrying transcripts.  Also pins the VariantInput insertion POINT
    encoding for SV overlap (an insertion after a feature's last base
    misses it; transcript_consequence.rs:89-96) and the TFBS_ablation
    MODERATE impact (so_terms.rs).  ZERO whitelist, byte-equal per
    variant against ref_out7.jsonl.gz."""
    from datafusion_bio_functions_spark.operators.vep import annotate_vep

    tx, ex, tl, _, _, _ = _load_context(spark)
    reg_rows, mot_rows, mir_rows, sv_rows = [], [], [], []
    for line in open(f"{FIX}/features7.tsv"):
        f = line.rstrip("\n").split("\t")
        s, e = int(f[2]), int(f[3])
        if f[0] == "reg":
            reg_rows.append(("1", s, e, f[1], f[4] if len(f) > 4 and f[4] else None))
        elif f[0] == "motif":
            mot_rows.append(("1", s, e, f[1]))
        elif f[0] == "mirna":
            mir_rows.append(("1", s, e, f[1]))
        elif f[0] == "sv":
            sv_rows.append(("1", s, e, f[4], f[5], f[1]))
    reg = spark.createDataFrame(
        reg_rows,
        "chrom string, start long, end long, feature_id string, feature_type string",
    )
    mot = spark.createDataFrame(
        mot_rows, "chrom string, start long, end long, feature_id string"
    )
    mirf = spark.createDataFrame(
        mir_rows, "chrom string, start long, end long, mirna_id string"
    )
    svf = spark.createDataFrame(
        sv_rows,
        "chrom string, start long, end long, feature_kind string, "
        "event_kind string, feature_id string",
    )
    v_rows = []
    for line in open(f"{FIX}/variants.tsv"):
        f = line.rstrip("\n").split("\t")
        v_rows.append((f[0], int(f[1]), int(f[2]), f[3], f[4]))
    vcf = spark.createDataFrame(
        v_rows, "chrom string, start long, end long, ref string, alt string"
    )
    cache = spark.createDataFrame(
        [],
        "chrom string, start long, end long, variation_name string, "
        "allele_string string",
    )
    out = annotate_vep(
        vcf, cache, transcripts=tx, exons=ex, regulatory=reg, motifs=mot,
        mirnas=mirf, structural=svf, translations=tl, vep_options={},
        reference_genome={"1": open(f"{FIX}/genome.txt").read().strip()},
    )
    got = {
        (r["start"], r["ref"], r["alt"]): (r["most_severe_consequence"], r["CSQ"])
        for r in out.select(
            "start", "ref", "alt", "most_severe_consequence", "CSQ"
        ).collect()
    }
    expected = {}
    with gzip.open(f"{FIX}/ref_out7.jsonl.gz", "rt") as fh:
        for line in fh:
            r = json.loads(line)
            expected[(r["pos"], r["ref"], r["alt"])] = (r["most"], r["csq"])
    assert set(expected) == set(got)
    diverged = {
        k: {"ref": expected[k], "got": got[k]}
        for k in sorted(expected)
        if expected[k] != got[k]
    }
    assert not diverged, (
        f"{len(diverged)} variants diverged from the SV replay: "
        f"{dict(list(diverged.items())[:3])}"
    )
