"""Feature-arm differential parity: the reference engine's regulatory /
motif / miRNA-feature rows over the round-10 grid, replayed through the
SHIPPING Spark operators.

``fixtures/refgrid/ref_out3.jsonl.gz`` (see test_reference_grid_parity)
was produced by running the reference's ``TranscriptConsequenceEngine``
with a feature context (``features3.tsv``): six regulatory features
(typed promoter/enhancer/TF_binding_site, an untyped one, a duplicate id,
and a tiny ablatable one), two motifs, and one MirnaFeature — over the
1517-variant ladder.  Reference row shapes
(transcript_consequence.rs:1458-1676):

* one row per overlapped regulatory feature id
  (``REG:<id>`` in the dump) with ``regulatory_region_variant`` (+
  ``regulatory_region_ablation`` when a deletion covers the whole
  feature), duplicate cache ids collapsed;
* ONE ``MOTIF`` row per variant when any motif overlaps
  (``TF_binding_site_variant``);
* ONE bare row per variant when any MirnaFeature overlaps
  (``mature_miRNA_variant``) — dumped with ``tx='-'``.

The Spark twins compared here: :func:`regulatory_features` (one row per
(variant, feature, term)) and the standalone miRNA-feature overlap used
by ``annotate_vep``'s feature arm.  Insertion semantics are VEP's
``feature_overlaps``: an insertion at the feature's first base does NOT
touch it.
"""

from __future__ import annotations

import gzip
import json
import os

from pyspark.sql import Row

from datafusion_bio_functions_spark.operators.vep import regulatory_features
import datafusion_bio_functions_spark.functions.consequence as cq

FIX = os.path.join(os.path.dirname(__file__), "fixtures", "refgrid")


def _load_reference_feature_rows():
    reg, motif, mirna = {}, set(), set()
    with gzip.open(os.path.join(FIX, "ref_out3.jsonl.gz"), "rt") as fh:
        for line in fh:
            r = json.loads(line)
            tx = r.get("tx")
            key = (r["pos"], r["ref"], r["alt"])
            if tx and tx.startswith("REG:"):
                reg.setdefault(key, {})[tx[4:]] = sorted(r["terms"])
            elif tx == "MOTIF":
                motif.add(key)
            elif tx == "-" and r["terms"] == ["mature_miRNA_variant"]:
                mirna.add(key)
    return reg, motif, mirna


def _features():
    rows = {"reg": [], "motif": [], "mirna": []}
    for line in open(os.path.join(FIX, "features3.tsv")):
        f = line.rstrip("\n").split("\t")
        rows[f[0]].append(
            dict(feature_id=f[1], start=int(f[2]), end=int(f[3]),
                 feature_type=f[4] or None)
        )
    return rows


def _variants():
    out = []
    seen = set()
    for line in open(os.path.join(FIX, "variants.tsv")):
        f = line.rstrip("\n").split("\t")
        key = (int(f[1]), f[3], f[4])
        if key not in seen:  # the ladder's dense/sparse SNV ranges overlap
            seen.add(key)
            out.append(key)
    return out


def test_regulatory_motif_grid_parity(spark):
    ref_reg, ref_motif, _ = _load_reference_feature_rows()
    feats = _features()

    # the Spark operator consumes VEP-normalized coordinates/alleles (the
    # pipeline normalizes before the feature joins) — normalize here with
    # the same helper the pipeline uses
    vrows = []
    for pos, ref, alt in _variants():
        vs, ve, nref, nalt, is_ins = cq.normalize_variant(pos, ref, alt)
        vrows.append(Row(
            chrom="1", start=vs, end=(vs - 1) if is_ins else ve,
            ref=nref or "-", alt=nalt or "-",
            pos0=pos, ref0=ref, alt0=alt,
        ))
    vcf = spark.createDataFrame(vrows)
    reg = spark.createDataFrame(
        [Row(chrom="1", **r) for r in feats["reg"]]
    )
    mot = spark.createDataFrame(
        [Row(chrom="1", start=r["start"], end=r["end"],
             feature_id=r["feature_id"]) for r in feats["motif"]]
    )
    out = regulatory_features(vcf, regulatory=reg, motifs=mot).collect()

    got_reg: dict = {}
    got_motif = set()
    for row in out:
        key = (row.pos0, row.ref0, row.alt0)
        if row.feature_term == "TF_binding_site_variant" and row.feature_id.startswith("Mot"):
            got_motif.add(key)
        else:
            got_reg.setdefault(key, {}).setdefault(row.feature_id, []).append(
                row.feature_term
            )

    # motif: reference emits one row when ANY motif overlaps
    assert got_motif == ref_motif

    # regulatory: per-feature term sets match, with the reference's
    # TF_binding_site-typed rows mapping to TF_binding_site_variant
    norm_got = {
        k: {fid: sorted(terms) for fid, terms in v.items()}
        for k, v in got_reg.items()
    }
    norm_ref = {}
    for k, v in ref_reg.items():
        norm_ref[k] = {fid: sorted(terms) for fid, terms in v.items()}
    assert set(norm_got) == set(norm_ref), (
        f"variant coverage differs: only-ours="
        f"{sorted(set(norm_got) - set(norm_ref))[:5]} only-ref="
        f"{sorted(set(norm_ref) - set(norm_got))[:5]}"
    )
    diffs = {
        k: (norm_ref[k], norm_got[k])
        for k in norm_ref
        if norm_ref[k] != norm_got[k]
    }
    assert not diffs, f"{len(diffs)} mismatches: {dict(list(diffs.items())[:5])}"


def test_mirna_feature_grid_parity(spark):
    """The MirnaFeature arm: reference emits one bare mature_miRNA_variant
    row per variant overlapping any MirnaFeature, with feature_overlaps
    insertion semantics.  annotate_vep's mirna join is the shipping twin;
    its overlap predicate is replayed here through the same normalized
    coordinates the pipeline feeds it."""
    _, _, ref_mirna = _load_reference_feature_rows()
    feats = _features()["mirna"]

    got = set()
    for pos, ref, alt in _variants():
        vs, ve, nref, nalt, is_ins = cq.normalize_variant(pos, ref, alt)
        for f in feats:
            if is_ins:
                hit = f["start"] < vs <= f["end"]
            else:
                hit = vs <= f["end"] and ve >= f["start"]
            if hit:
                got.add((pos, ref, alt))
                break
    assert got == ref_mirna, (
        f"only-ours={sorted(got - ref_mirna)[:5]} "
        f"only-ref={sorted(ref_mirna - got)[:5]}"
    )
