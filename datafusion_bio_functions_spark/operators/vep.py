"""VEP-style variant annotation operators (phase A).

Re-expresses the reference's ``datafusion-bio-function-vep`` lookup path:

* ``lookup_variants``  — reference UDTF ``lookup_variants(vcf, cache
  [,columns] [,match_mode] [,extended_probes])`` (``table_function.rs:
  25-132``, provider ``lookup_provider.rs:72-250``, join engine
  ``variant_lookup_exec.rs:1-2397``): LEFT join of VCF rows against the
  variation cache on VEP-normalized coordinates with ``match_allele`` as the
  join-level filter; unmatched VCF rows keep NULL cache columns.
* ``annotate_vep``     — phase A of the reference's ``annotate_vep`` UDTF
  (``annotate_table_function.rs:19-132``): VCF passthrough + known-variant
  lookup + CSQ-style ``Existing_variation`` assembly +
  ``most_severe_consequence`` placeholder.  The transcript consequence
  engine (reference ``transcript_consequence.rs``, 21 kLoC) is phase B.

Spark plan shape: the cache is orders of magnitude larger than a VCF batch,
so — like the reference, which always builds on the VCF side
(``variant_lookup_exec.rs:1-8``) — the *VCF* side is broadcast and the
cache streams.  With a chrom-partitioned parquet cache Catalyst prunes
partitions from the ``chrom`` equi-key automatically (the reference needs
explicit per-chrom table registration, ``partitioned_cache.rs:1-40``).

The fjall KV point-lookup backend (``kv_cache/*``) is deliberately NOT
ported: its capability — O(1) per-variant lookup of a position-keyed cache —
is exactly a broadcast hash join here (SURVEY.md §2.1 S5).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.alleles import (
    match_allele_relaxed_udf,
    match_allele_udf,
    vep_norm_end_udf,
    vep_norm_start_udf,
)

#: cache columns never projected by default (reference vep
#: table_function.rs:86-93 excludes source_* columns)
_DEFAULT_EXCLUDED_PREFIX = "source_"
#: required cache columns per the reference schema contract
#: (schema_contract.rs:10-33)
CACHE_REQUIRED = ("chrom", "start", "end", "variation_name", "allele_string")
VCF_REQUIRED = ("chrom", "start", "end", "ref", "alt")


def _check_contract(df: DataFrame, required: Sequence[str], what: str) -> None:
    missing = [c for c in required if c not in df.columns]
    if missing:
        raise ValueError(f"{what} is missing required columns {missing} (has {df.columns})")


def lookup_variants(
    vcf: DataFrame,
    cache: DataFrame,
    columns: Sequence[str] | None = None,
    match_mode: str = "exact",
    extended_probes: bool = False,
    broadcast_vcf: bool = True,
) -> DataFrame:
    """Known-variant annotation: VCF LEFT-joined to the variation cache.

    * coordinates are VEP-normalized on the VCF side (``vep_norm_start`` /
      ``vep_norm_end`` — prefix/suffix trim shifts, insertions encoded
      start > end) and matched exactly against cache (start, end);
    * ``extended_probes=True`` switches to overlap matching around the
      variant span (shifted-indel tolerance, reference lookup_provider.rs
      ``extended_probes``);
    * allele agreement (``match_allele`` strict, or ``match_allele_relaxed``
      when ``match_mode='relaxed'``) is part of the join condition, so a
      co-located-but-different variant yields NULL cache columns;
    * ``columns`` projects cache annotation columns (default: all except
      ``source_*``).

    Output: all VCF columns + selected cache columns (nullable) +
    ``matched`` boolean.
    """
    _check_contract(vcf, VCF_REQUIRED, "vcf")
    _check_contract(cache, CACHE_REQUIRED, "cache")
    if match_mode not in ("exact", "relaxed"):
        raise ValueError(f"match_mode must be 'exact' or 'relaxed', got {match_mode!r}")

    if columns is None:
        columns = [
            c
            for c in cache.columns
            if c not in ("chrom", "start", "end") and not c.startswith(_DEFAULT_EXCLUDED_PREFIX)
        ]
    else:
        columns = list(columns)
        if "variation_name" not in columns:
            columns = ["variation_name"] + columns
    # the allele matcher always needs allele_string internally
    internal_cols = list(columns)
    if "allele_string" not in internal_cols:
        internal_cols.append("allele_string")

    v = vcf.select(
        "*",
        vep_norm_start_udf(F.col("start").cast("long"), F.col("ref"), F.col("alt")).alias(
            "__vstart"
        ),
        vep_norm_end_udf(F.col("start").cast("long"), F.col("ref"), F.col("alt")).alias("__vend"),
    )
    c = cache.select(
        F.col("chrom").alias("__c_chrom"),
        F.col("start").cast("long").alias("__c_start"),
        F.col("end").cast("long").alias("__c_end"),
        *[F.col(x).alias(f"__c_{x}") for x in internal_cols],
    )

    matcher = match_allele_udf if match_mode == "exact" else match_allele_relaxed_udf
    allele_ok = matcher(F.col("ref"), F.col("alt"), F.col("__c_allele_string"))

    chrom_eq = F.col("chrom") == F.col("__c_chrom")
    if extended_probes:
        # overlap the normalized span (insertions: start>end → use min/max)
        lo = F.least(F.col("__vstart"), F.col("__vend"))
        hi = F.greatest(F.col("__vstart"), F.col("__vend"))
        coord = (F.col("__c_start") <= hi + 1) & (F.col("__c_end") >= lo - 1)
    else:
        coord = (F.col("__c_start") == F.col("__vstart")) & (
            F.col("__c_end") == F.col("__vend")
        )

    # Python UDFs cannot sit in an outer-join ON clause: probe with an INNER
    # join (+ UDF post-filter, which Catalyst pushes under the join output),
    # then restore unmatched VCF rows by left-joining hits back on a row id.
    v = v.withColumn("__vid", F.monotonically_increasing_id())
    probe = F.broadcast(v) if broadcast_vcf else v
    hits = (
        probe.join(c, chrom_eq & coord, "inner")
        .filter(allele_ok)
        .select("__vid", *[F.col(f"__c_{x}").alias(x) for x in columns])
        .withColumn("matched", F.lit(True))
    )
    joined = v.join(hits, "__vid", "left")
    out_cols = [*vcf.columns] + list(columns) + [
        F.coalesce(F.col("matched"), F.lit(False)).alias("matched")
    ]
    return joined.select(*out_cols)


#: Severity-ranked Sequence Ontology terms (public SO/VEP severity order;
#: reference so_terms.rs:5-299 rank 1..41, impact HIGH..MODIFIER).  Phase A
#: uses only the tail entries; the full table ships now so phase B plugs in.
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

SO_RANK = {term: i + 1 for i, (term, _) in enumerate(SO_TERMS_BY_RANK)}


def annotate_vep(
    vcf: DataFrame,
    cache: DataFrame,
    transcripts: DataFrame | None = None,
    match_mode: str = "exact",
    extended_probes: bool = False,
    upstream_distance: int = 5000,
    downstream_distance: int = 500,
) -> DataFrame:
    """Phase-A annotation pipeline: known-variant lookup + a coarse
    positional consequence classifier when a ``transcripts`` context table
    (``transcript_id, chrom, start, end, strand, biotype, gene_stable_id,
    gene_symbol``) is given.

    Output: VCF columns + ``CSQ`` (pipe-joined ``Allele|Consequence|
    Existing_variation|SYMBOL|Gene``) + ``most_severe_consequence`` +
    ``existing_variation``.  Phase B replaces the positional classifier with
    the full transcript consequence engine (codon-level; reference
    ``transcript_consequence.rs:801-1124``) behind the same API.
    """
    looked = lookup_variants(
        vcf, cache, match_mode=match_mode, extended_probes=extended_probes
    )

    if transcripts is not None:
        t = transcripts.select(
            F.col("chrom").alias("__t_chrom"),
            F.col("start").cast("long").alias("__t_start"),
            F.col("end").cast("long").alias("__t_end"),
            F.col("strand").cast("int").alias("__t_strand"),
            F.col("biotype").alias("__t_biotype"),
            F.col("gene_stable_id").alias("__t_gene"),
            F.col("gene_symbol").alias("__t_symbol"),
        )
        up, down = upstream_distance, downstream_distance
        pos = F.col("start").cast("long")
        # coarse positional classes (phase A): inside transcript vs up/downstream
        inside = (pos >= F.col("__t_start")) & (pos <= F.col("__t_end"))
        upstream = F.when(
            F.col("__t_strand") >= 0,
            (pos < F.col("__t_start")) & (pos >= F.col("__t_start") - up),
        ).otherwise((pos > F.col("__t_end")) & (pos <= F.col("__t_end") + up))
        downstream = F.when(
            F.col("__t_strand") >= 0,
            (pos > F.col("__t_end")) & (pos <= F.col("__t_end") + down),
        ).otherwise((pos < F.col("__t_start")) & (pos >= F.col("__t_start") - down))
        near = looked.join(
            F.broadcast(t),
            (F.col("chrom") == F.col("__t_chrom")) & (inside | upstream | downstream),
            "left",
        )
        consequence = (
            F.when(inside & (F.col("__t_biotype") == "protein_coding"), "coding_transcript_variant")
            .when(inside, "non_coding_transcript_variant")
            .when(upstream, "upstream_gene_variant")
            .when(downstream, "downstream_gene_variant")
            .otherwise("intergenic_variant")
        )
        near = near.withColumn(
            "consequence",
            F.when(F.col("__t_chrom").isNull(), "intergenic_variant").otherwise(consequence),
        )
        rank_map = F.map_from_arrays(
            F.array(*[F.lit(t_) for t_, _ in SO_TERMS_BY_RANK]),
            F.array(*[F.lit(i + 1) for i in range(len(SO_TERMS_BY_RANK))]),
        )
        near = near.withColumn("__rank", rank_map[F.col("consequence")])
        grouped = near.groupBy(*[F.col(c) for c in looked.columns]).agg(
            F.min_by("consequence", "__rank").alias("most_severe_consequence"),
            F.array_sort(F.collect_set("consequence")).alias("__all_csq"),
            F.array_sort(F.collect_set("__t_symbol")).alias("__symbols"),
            F.array_sort(F.collect_set("__t_gene")).alias("__genes"),
        )
    else:
        grouped = looked.withColumn(
            "most_severe_consequence",
            F.when(F.col("matched"), "sequence_variant").otherwise(F.lit(None)),
        ).withColumn("__all_csq", F.array(F.col("most_severe_consequence"))).withColumn(
            "__symbols", F.array().cast("array<string>")
        ).withColumn("__genes", F.array().cast("array<string>"))

    out = grouped.withColumn(
        "existing_variation", F.coalesce(F.col("variation_name"), F.lit(""))
    ).withColumn(
        "CSQ",
        F.concat_ws(
            "|",
            F.col("alt"),
            F.concat_ws("&", F.col("__all_csq")),
            F.col("existing_variation"),
            F.concat_ws("&", F.col("__symbols")),
            F.concat_ws("&", F.col("__genes")),
        ),
    )
    return out.drop("__all_csq", "__symbols", "__genes")
