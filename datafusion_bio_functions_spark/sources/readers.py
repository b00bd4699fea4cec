"""Source readers / sinks.

Reference surface (SURVEY.md §2.1):

* S2 VCF read/write  — here: text parse of the standard 8-column body into
  the VCF contract frame; write back as VCF text lines.
* S3 CSV/Parquet     — ``spark.read.csv/parquet`` 1:1; thin helpers with the
  interval/alignment schemas pre-applied.
* S4 per-chrom partitioned cache — ``partitionBy("chrom")`` parquet;
  ``write_partitioned_cache`` / plain ``spark.read.parquet`` with automatic
  partition pruning replaces the reference's manual per-chrom registration
  (``partitioned_cache.rs:1-40``).
* S6 cache builder   — ``build_sorted_cache``: range-repartition by
  (chrom, start) + sortWithinPartitions so row-group min/max statistics give
  data skipping — the Spark analogue of the reference's sorted row-group
  tuned cache (``cache_builder.rs:1-41``).
* S1 BAM             — ``sources.bam``: pure-Python BGZF/BAM codec (public
  SAM spec) over ``binaryFile`` + ``mapInPandas``; ``read_bam`` here
  forwards to it.  ``read_alignments_parquet`` reads the pre-converted
  contract frame (the reference's own unit tests feed the same in-memory
  contract, ``physical_exec.rs:570-642``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

INTERVAL_SCHEMA = T.StructType(
    [
        T.StructField("contig", T.StringType(), False),
        T.StructField("pos_start", T.LongType(), False),
        T.StructField("pos_end", T.LongType(), False),
    ]
)

ALIGNMENT_SCHEMA = T.StructType(
    [
        T.StructField("chrom", T.StringType(), False),
        T.StructField("start", T.LongType(), False),
        T.StructField("flags", T.IntegerType(), False),
        T.StructField("cigar", T.StringType(), False),
        T.StructField("mapping_quality", T.IntegerType(), False),
    ]
)


def read_interval_csv(spark: SparkSession, path: str, header: bool = True) -> DataFrame:
    """contig,pos_start,pos_end CSV (the reference's testing/data layout)."""
    return spark.read.csv(path, header=header, schema=INTERVAL_SCHEMA)


def read_alignments_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def read_bam(spark: SparkSession, path: str, **kwargs) -> DataFrame:
    from .bam import read_bam as _read_bam

    return _read_bam(spark, path, **kwargs)


def read_bed(
    spark: SparkSession, path: str, one_based: bool = True
) -> DataFrame:
    """Read BED (browser extensible data: ``chrom  start  end  [name score
    strand ...]``, 0-based half-open) into the interval contract frame.
    ``one_based=True`` (default) converts to the engine's 1-based closed
    convention (start+1, end unchanged — half-open end == closed end);
    ``one_based=False`` keeps raw BED coordinates for ``filter_op='strict'``
    pipelines.  Extra columns beyond the first three are preserved as
    ``name``, ``score``, ``strand`` when present."""
    p = F.split(F.col("value"), "\t")
    lines = spark.read.text(path).filter(
        ~F.col("value").startswith("#")
        & ~F.col("value").startswith("track")
        & ~F.col("value").startswith("browser")
        & (F.length(F.trim(F.col("value"))) > 0)
    )
    # try_cast: a malformed coordinate nulls the row (dropped below)
    # instead of raising under ANSI mode and killing the scan
    start = F.get(p, 1).try_cast("long") + (1 if one_based else 0)
    out = lines.select(
        F.get(p, 0).alias("contig"),
        start.alias("pos_start"),
        F.get(p, 2).try_cast("long").alias("pos_end"),
        F.get(p, 3).alias("name"),
        F.get(p, 4).try_cast("int").alias("score"),
        F.get(p, 5).alias("strand"),
    )
    return out.filter(
        F.col("contig").isNotNull()
        & F.col("pos_start").isNotNull()
        & F.col("pos_end").isNotNull()
    )


def load_fasta(path: str) -> dict[str, str]:
    """Load a (plain or gzip-compressed) FASTA file into a ``{chrom: seq}``
    mapping for ``annotate_vep(reference_genome=...)`` — the driver-side
    analogue of the reference's indexed-FASTA reader
    (``annotate_provider.rs`` ``hgvs_reference_reader`` /
    ``validate_hgvs_reference_fasta``).  The contig name is the first
    whitespace-delimited token of each ``>`` header, like samtools.

    The whole genome is held in driver memory and broadcast once to the
    executors — fine up to a few GB (a human genome is ~3 GB).  For larger
    references, or to avoid the driver copy entirely, pass a picklable
    ``fetch(chrom, start, end)`` callable to ``reference_genome`` that
    opens an indexed FASTA lazily per executor instead."""
    import gzip as _gzip

    opener = _gzip.open if path.endswith((".gz", ".bgz")) else open
    seqs: dict[str, list[str]] = {}
    cur: list[str] | None = None
    with opener(path, "rt") as fh:
        for line in fh:
            line = line.strip()
            if not line:
                continue
            if line.startswith(">"):
                name = line[1:].split()[0]
                cur = seqs.setdefault(name, [])
            elif cur is not None:
                cur.append(line)
    return {name: "".join(parts) for name, parts in seqs.items()}


def _gtf_attr(attrs: "F.Column", key: str) -> "F.Column":
    return F.regexp_extract(attrs, key + r' "([^"]*)"', 1)


def read_gtf(spark: SparkSession, path: str) -> DataFrame:
    """Read GTF/GFF2 (9 tab-separated columns, 1-based closed) into a frame
    of ``(chrom, source, feature, start, end, score, strand, frame,
    attributes)`` — the raw form; see :func:`gtf_transcripts` /
    :func:`gtf_exons` for the annotate_vep context contracts."""
    p = F.split(F.col("value"), "\t")
    lines = spark.read.text(path).filter(
        ~F.col("value").startswith("#") & (F.length(F.trim(F.col("value"))) > 0)
    )
    return lines.select(
        F.get(p, 0).alias("chrom"),
        F.get(p, 1).alias("source"),
        F.get(p, 2).alias("feature"),
        F.get(p, 3).try_cast("long").alias("start"),
        F.get(p, 4).try_cast("long").alias("end"),
        F.get(p, 5).alias("score"),
        F.get(p, 6).alias("strand"),
        F.get(p, 7).alias("frame"),
        F.get(p, 8).alias("attributes"),
    ).filter(
        # malformed lines (missing feature, non-numeric/truncated
        # coordinates) drop here — a NULL start would otherwise corrupt
        # the downstream exon/transcript contracts silently
        F.col("feature").isNotNull()
        & F.col("start").isNotNull()
        & F.col("end").isNotNull()
    )


def gtf_transcripts(gtf: DataFrame) -> DataFrame:
    """Project GTF ``transcript`` rows onto the annotate_vep transcripts
    contract (``annotate_provider.rs:2511-2563`` subset)."""
    t = gtf.filter(F.col("feature") == "transcript")
    a = F.col("attributes")
    return t.select(
        _gtf_attr(a, "transcript_id").alias("transcript_id"),
        "chrom",
        "start",
        "end",
        F.when(F.col("strand") == "-", -1).otherwise(1).alias("strand"),
        _gtf_attr(a, "transcript_biotype").alias("biotype"),
        _gtf_attr(a, "gene_id").alias("gene_stable_id"),
        _gtf_attr(a, "gene_name").alias("gene_symbol"),
    )


def gtf_exons(gtf: DataFrame) -> DataFrame:
    """Project GTF ``exon`` rows onto the exon context contract
    (``annotate_provider.rs:2893-2899``)."""
    e = gtf.filter(F.col("feature") == "exon")
    return e.select(
        _gtf_attr(F.col("attributes"), "transcript_id").alias("transcript_id"),
        "start",
        "end",
        "chrom",
    )


def vcf_sample_names(spark: SparkSession, path: str) -> list[str]:
    """Sample names from the ``#CHROM`` header line (columns after FORMAT).
    One bounded driver-side read of the header block — the header is a few
    KB regardless of body size, so this is scale-safe.  Empty list for
    sample-less files."""
    hdr = (
        spark.read.text(path)
        .filter(F.col("value").startswith("#CHROM"))
        .limit(1)
        .collect()
    )
    if not hdr:
        return []
    cols = hdr[0][0].rstrip("\n").split("\t")
    return cols[9:] if len(cols) > 9 else []


def read_vcf(
    spark: SparkSession, path: str, with_genotypes: bool = False,
    samples: bool = False, split_multiallelic: bool = False,
) -> DataFrame:
    """Parse a (possibly bgzip-less) VCF text file into the VCF contract
    frame (chrom, start, end, id, ref, alt, qual, filter, info).  ``end`` is
    ``start + len(ref) - 1`` (1-based closed, reference
    ``variant_lookup_exec.rs:941-952``).

    ``with_genotypes=True`` appends a ``GT`` column from the first sample
    column of single-sample files (the sink's ``sample_name=`` output
    round-trips): the GT sub-field is looked up by its position in the
    per-row FORMAT field, NULL when the row carries no sample data.

    ``samples=True`` appends the MULTI-sample genotype state the
    reference sink streams as passthrough columns (``vcf_sink.rs:1-60``):
    ``format`` (the per-row FORMAT string) and ``genotypes`` — a
    ``map<sample_name, sample_field>`` carrying every sample's RAW
    colon-joined field block, keyed by the ``#CHROM`` header names.  The
    map preserves full FORMAT payloads (GT:DP:GQ...), so a round-trip
    through :func:`write_vcf` is lossless per sample.

    ``split_multiallelic=True`` explodes comma-separated ALT alleles into
    one row per alternate (plus an ``alt_index``, 1-based) — the
    consequence/lookup engines consume single-alt rows, like VEP's own
    per-allele evaluation.  Sample/genotype columns ride along unchanged
    (allele re-indexing of GT values is genuinely ambiguous without the
    full FORMAT semantics and is left to the caller).

    Malformed body lines are SKIPPED, not fatal: blank lines, lines with
    fewer than the 8 fixed VCF columns, and rows whose POS does not parse
    as an integer (one bad line must not kill a 100 TB ingest; ANSI mode
    would otherwise raise on the array index / cast)."""
    sample_names = vcf_sample_names(spark, path) if samples else []
    lines = spark.read.text(path).filter(
        ~F.col("value").startswith("#") & (F.length(F.trim(F.col("value"))) > 0)
    )
    p = F.split(F.col("value"), "\t")
    # F.get is null-safe on out-of-bounds and try_cast on malformed text,
    # so correctness does not hinge on filter ordering under ANSI
    start = F.get(p, 1).try_cast("long")
    cols = [
        F.get(p, 0).alias("chrom"),
        start.alias("start"),
        (start + F.length(F.get(p, 3)) - 1).alias("end"),
        F.get(p, 2).alias("id"),
        F.get(p, 3).alias("ref"),
        F.get(p, 4).alias("alt"),
        F.get(p, 5).alias("qual"),
        F.get(p, 6).alias("filter"),
        F.get(p, 7).alias("info"),
    ]
    if with_genotypes:
        # position of 'GT' in the FORMAT field → same slot of the first
        # sample column (the VCF FORMAT contract)
        fmt = F.split(F.get(p, 8), ":")
        gt_idx = F.array_position(fmt, "GT")
        cols.append(
            F.when(
                (F.size(p) >= 10) & (gt_idx > 0),
                F.get(F.split(F.get(p, 9), ":"), gt_idx.cast("int") - 1),
            ).alias("GT")
        )
    if samples:
        cols.append(F.get(p, 8).alias("format"))
        cols.append(
            F.map_from_arrays(
                F.array(*[F.lit(s) for s in sample_names]),
                F.array(*[F.get(p, 9 + i) for i in range(len(sample_names))]),
            ).alias("genotypes")
            if sample_names
            else F.lit(None)
            .cast("map<string,string>")
            .alias("genotypes")
        )
    out = lines.filter(F.size(p) >= 8).select(*cols).filter(F.col("start").isNotNull())
    if split_multiallelic:
        others = [c for c in out.columns if c != "alt"]
        out = out.select(
            *others,
            F.posexplode(F.split(F.col("alt"), ",")).alias("__ai", "alt"),
        ).select(
            *[c if c != "end" else c for c in others],
            "alt",
            (F.col("__ai") + 1).cast("int").alias("alt_index"),
        )
    return out


def write_vcf(
    df: DataFrame,
    path: str,
    info_col: str | None = None,
    sample_name: str | None = None,
    gt_col: str = "GT",
    sample_names: "list[str] | None" = None,
    genotypes_col: str = "genotypes",
    format_col: str = "format",
) -> None:
    """Serialize the VCF contract frame back to VCF body text (one part per
    partition; the reference's vcf_sink streams batch-wise the same way,
    ``vcf_sink.rs:1-60``).  With ``sample_name`` set, a single-sample
    ``FORMAT``/genotype column pair is appended to every row — the
    reference's output contract (``tests/vcf_output_roundtrip.rs:86-96``):
    the FORMAT field is ``GT`` and a missing/null genotype renders as the
    VCF missing genotype ``./.``.

    ``sample_names`` switches to MULTI-sample output (the reference sink
    streams arbitrary passthrough sample columns): per row, the FORMAT
    string comes from ``format_col`` when present (else ``GT``) and each
    named sample's field block is read from the ``genotypes_col`` map
    (``read_vcf(samples=True)``'s shape), missing entries rendering as
    ``./.``.  Sample column ORDER follows ``sample_names`` — pass the list
    from :func:`vcf_sample_names` for a faithful round-trip."""
    info = F.col(info_col) if info_col else F.lit(".")
    fields = [
        F.col("chrom"),
        F.col("start").cast("string"),
        F.coalesce(F.col("id"), F.lit(".")),
        F.col("ref"),
        F.col("alt"),
        F.coalesce(F.col("qual"), F.lit(".")),
        F.coalesce(F.col("filter"), F.lit(".")),
        info,
    ]
    if sample_names is not None:
        fmt = (
            F.coalesce(F.col(format_col), F.lit("GT"))
            if format_col in df.columns
            else F.lit("GT")
        )
        gmap = (
            F.col(genotypes_col)
            if genotypes_col in df.columns
            else F.lit(None).cast("map<string,string>")
        )
        fields += [fmt] + [
            F.coalesce(F.element_at(gmap, F.lit(s)), F.lit("./."))
            for s in sample_names
        ]
    elif sample_name is not None:
        gt = (
            F.coalesce(F.col(gt_col), F.lit("./."))
            if gt_col in df.columns
            else F.lit("./.")
        )
        fields += [F.lit("GT"), gt]
    out = df.select(F.concat_ws("\t", *fields).alias("value"))
    out.write.mode("overwrite").text(path)
    if sample_names is not None:
        # a faithful multi-sample round-trip needs the #CHROM header line —
        # read_vcf(samples=True) recovers the sample names from it.  Header
        # is advisory on non-local filesystems (same policy as
        # annotate_to_vcf's CSQ header).
        import os

        try:
            with open(os.path.join(path, "00_header.vcf"), "w") as fh:
                fh.write(
                    "##fileformat=VCFv4.2\n"
                    "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\t"
                    + "\t".join(sample_names)
                    + "\n"
                )
        except OSError:
            pass


def annotate_to_vcf(
    vcf: DataFrame,
    cache: DataFrame,
    path: str,
    progress=None,
    sample_name: str | None = None,
    gt_col: str = "GT",
    sample_names: "list[str] | None" = None,
    genotypes_col: str = "genotypes",
    format_col: str = "format",
    **annotate_kwargs,
) -> int:
    """The reference's ``annotate_to_vcf()`` (``vcf_sink.rs:1-60``): run
    ``annotate_vep``, fold the CSQ string into the INFO column, and stream
    the annotated rows to VCF text.  ``progress(done, total)`` is invoked
    around the job (the reference's per-batch callback is a single-process
    luxury; distributed writes report at job granularity).  A
    ``00_header.vcf`` file carrying the ``##INFO=<ID=CSQ,...>`` header with
    the Format field list (reference ``vcf_sink.rs:358-372``) is written
    alongside the body parts — sorted-concat consumers read a valid VCF,
    and ``read_vcf`` skips ``#`` lines either way.  Returns the row count
    written."""
    import os

    from ..operators.vep import annotate_vep, vep_csq_fields

    ann = annotate_vep(vcf, cache, **annotate_kwargs)
    total = ann.count()
    if progress is not None:
        progress(0, total)
    out = ann.withColumn(
        "info",
        F.when(F.col("CSQ") != "", F.concat(F.lit("CSQ="), F.col("CSQ"))).otherwise("."),
    )
    # genotype state on the INPUT frame rides through to the sample
    # column(s) even when annotate_vep does not project it.  The GT side
    # collapses to ONE row per variant key first — a VCF with duplicate
    # variant rows would otherwise fan the left join out and silently
    # duplicate output body lines — and the pick is DETERMINISTIC: the
    # lexicographically smallest genotype payload wins when duplicate keys
    # carry conflicting genotypes (a malformed input; any stable rule is
    # defensible, min is reproducible across runs and engines).
    def _ride_through(cols: list[str]) -> DataFrame:
        keys = ["chrom", "start", "ref", "alt"]
        side = vcf.select(*keys, *cols)
        # canonical ordering key: map columns sort their entries first —
        # Spark's map serialization order is row-dependent, and the pick
        # must not hinge on it
        parts = []
        for c in cols:
            dt = dict(side.dtypes)[c]
            col = F.col(c)
            parts.append(
                F.to_json(F.array_sort(F.map_entries(col)))
                if dt.startswith("map<")
                else col.cast("string")
            )
        ordkey = F.concat_ws("\x1f", *[F.coalesce(p, F.lit("\x7f")) for p in parts])
        from pyspark.sql import Window as _W

        w = _W.partitionBy(*keys).orderBy(ordkey.asc_nulls_last())
        return (
            side.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )

    if sample_names is not None:
        ride = [c for c in (genotypes_col, format_col) if c in vcf.columns]
        if ride:
            # ALWAYS re-join the deterministic pick — any copy of these
            # columns that rode through the annotation rollup carries an
            # arbitrary row's value for duplicate variant keys
            out = out.drop(*ride).join(
                _ride_through(ride),
                ["chrom", "start", "ref", "alt"],
                "left",
            )
    elif sample_name is not None and gt_col not in out.columns and gt_col in vcf.columns:
        out = out.join(
            _ride_through([gt_col]),
            ["chrom", "start", "ref", "alt"],
            "left",
        )
    for c in ("id", "qual", "filter"):
        if c not in out.columns:
            out = out.withColumn(c, F.lit("."))
    write_vcf(
        out, path, info_col="info", sample_name=sample_name, gt_col=gt_col,
        sample_names=sample_names, genotypes_col=genotypes_col,
        format_col=format_col,
    )
    try:
        # the advertised Format list must agree with the entry layout the
        # body actually carries: codon-engine entries follow
        # vep_csq_fields(csq_mode, csq_everything) (74/78/79 or 80/85/86
        # fields); the positional engine emits its own short 5-field layout
        from ..operators.vep import resolve_csq_mode, resolve_engine

        engine = resolve_engine(
            annotate_kwargs.get("engine", "auto"),
            annotate_kwargs.get("transcripts"),
        )
        if engine == "codon":
            # the SAME resolution rules annotate_vep applies — shared
            # helpers so the advertised header cannot drift from the body
            fields = vep_csq_fields(
                resolve_csq_mode(
                    annotate_kwargs.get("csq_mode", "ensembl"),
                    annotate_kwargs.get("transcript_selection"),
                ),
                annotate_kwargs.get("csq_everything", False),
            )
        else:
            fields = ["Allele", "Consequence", "Existing_variation", "SYMBOL", "Gene"]
        fmt = "|".join(fields)
        # single-sample output adds the GT FORMAT declaration and the sample
        # column name (reference tests/vcf_output_roundtrip.rs:17-31,146-156)
        format_line = (
            '##FORMAT=<ID=GT,Number=1,Type=String,Description="Genotype">\n'
            if sample_name is not None or sample_names
            else ""
        )
        columns = "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO"
        if sample_names:
            columns += "\tFORMAT\t" + "\t".join(sample_names)
        elif sample_name is not None:
            columns += f"\tFORMAT\t{sample_name}"
        header = (
            "##fileformat=VCFv4.2\n"
            '##INFO=<ID=CSQ,Number=.,Type=String,Description="Consequence '
            f'annotations from annotate_vep. Format: {fmt}">\n'
            f"{format_line}"
            f"{columns}\n"
        )
        with open(os.path.join(path, "00_header.vcf"), "w") as fh:
            fh.write(header)
    except OSError:
        pass  # non-local filesystem: body parts only (header is advisory)
    if progress is not None:
        progress(total, total)
    return total


def write_partitioned_cache(df: DataFrame, path: str, chrom_col: str = "chrom") -> None:
    """Per-chromosome partitioned parquet (reference S4 layout); partition
    pruning then applies to any chrom-filtered read automatically."""
    df.write.mode("overwrite").partitionBy(chrom_col).parquet(path)


def build_sorted_cache(
    df: DataFrame,
    path: str,
    chrom_col: str = "chrom",
    pos_col: str = "start",
    partitions: int | None = None,
    compression: str = "zstd",
    row_group_mb: int | None = None,
) -> None:
    """Reference S6 cache-builder analogue: range-partition by (chrom, pos),
    sort within partitions, write per-chrom parquet — row-group min/max
    statistics then provide point-lookup data skipping.  ``compression``
    defaults to zstd and ``row_group_mb`` tunes parquet block size, the two
    knobs the reference's builder tunes for scan-time skipping
    (``cache_builder.rs:1-41``, fjall proposal zstd/table-size targets).
    Ordering is GENOMIC, not alphabetical: canonical chromosomes sort by
    code (1..22, X, Y, MT) with non-canonical contigs after them — the
    reference sorts main chroms by CHROM_CODE_ORDER precisely because
    schema-metadata order is alphabetical (``cache_builder.rs:2086-2096``)."""
    from ..functions.coordinates import genomic_sort_keys

    # range partitions follow GENOMIC key order (locality + balance across
    # tasks); the within-partition sort must LEAD with the raw partition
    # column — the parquet writer re-sorts by it otherwise (unstably,
    # destroying the pos order row-group skipping depends on).  Within one
    # chrom the genomic keys are constant, so (chrom, pos) yields the same
    # per-file ordering.
    rp = df.repartitionByRange(
        *( [partitions] if partitions else [] ),
        *genomic_sort_keys(chrom_col),
        F.col(pos_col),
    ).sortWithinPartitions(chrom_col, pos_col)
    writer = rp.write.mode("overwrite").option("compression", compression)
    if row_group_mb:
        writer = writer.option("parquet.block.size", row_group_mb * 1024 * 1024)
    writer.partitionBy(chrom_col).parquet(path)


def write_bucketed_table(
    df: DataFrame,
    table_name: str,
    n_buckets: int = 64,
    bucket_col: str = "contig",
    sort_cols: tuple[str, ...] = ("contig", "pos_start"),
    path: str | None = None,
) -> None:
    """Write a bucketed + sorted table (Hive-style bucketing): two tables
    bucketed identically on the join key co-locate, so contig-keyed joins
    (the ``algorithm='sql'`` interval join, per-chrom context joins) run
    WITHOUT a shuffle — the 100 TB answer to 'this join re-shuffles the same
    cache every query'.  Spark requires ``saveAsTable`` for bucket metadata;
    pass ``path`` to keep the data external to the warehouse."""
    w = df.write.mode("overwrite").format("parquet")
    if path is not None:
        w = w.option("path", path)
    w.bucketBy(n_buckets, bucket_col).sortBy(*sort_cols).saveAsTable(table_name)


#: VEP Ensembl-cache region width used by the builder's dedup preference
#: (reference cache_builder.rs VEP_CACHE_REGION_SIZE_BP)
VEP_CACHE_REGION_SIZE_BP = 1_000_000


def dedup_translations(df: DataFrame) -> DataFrame:
    """Cache-ingest translation dedup (reference
    ``build_translation_dedup_query_with_where_clause``,
    ``cache_builder.rs:77-88``): an Ensembl cache can carry one
    transcript's translation row in several region spill files; keep ONE
    row per ``transcript_id``, preferring (1) the row whose
    ``source_file`` is the transcript's OWN 1 Mb cache region file
    (``.../<region_start>-<region_end>.gz``), then (2) the smallest
    ``cdna_coding_start`` with NULLs last, then (3) ``source_file`` as
    the deterministic tie-break.  Window + row_number — one shuffle on
    transcript_id, no collect."""
    from pyspark.sql import Window

    region_start = (
        F.floor((F.col("start").cast("long") - 1) / F.lit(VEP_CACHE_REGION_SIZE_BP))
        * F.lit(VEP_CACHE_REGION_SIZE_BP)
        + F.lit(1)
    ).cast("long")
    region_end = (region_start + F.lit(VEP_CACHE_REGION_SIZE_BP) - 1).cast("long")
    own_region = F.concat(
        F.lit("/"), region_start.cast("string"), F.lit("-"),
        region_end.cast("string"), F.lit(".gz"),
    )
    pref = (
        F.when(
            F.col("source_file").endswith(own_region), 0
        ).otherwise(1)
        if "source_file" in df.columns
        else F.lit(1)
    )
    sf = F.col("source_file") if "source_file" in df.columns else F.lit("")
    ccs = (
        F.col("cdna_coding_start").cast("long")
        if "cdna_coding_start" in df.columns
        else F.lit(None).cast("long")
    )
    w = Window.partitionBy("transcript_id").orderBy(
        pref.asc(), ccs.asc_nulls_last(), sf.asc()
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def dedup_transcripts(df: DataFrame, key: str = "stable_id") -> DataFrame:
    """Cache-ingest transcript dedup (reference export query contract,
    ``cache_builder.rs`` ``test_build_query_transcript_dedup``: ROW_NUMBER
    PARTITION BY stable_id, keep ``_rn = 1``).  The upstream window order
    is not vendored; this orders by (chrom, start) with a FULL-ROW content
    hash as the final tie-break — duplicate spill rows usually share the
    coordinates but differ in payload, and without the hash the pick would
    be shuffle-order dependent across re-runs."""
    from pyspark.sql import Window

    def _c(name: str) -> "F.Column":
        return F.col(name) if name in df.columns else F.lit(None)

    w = Window.partitionBy(key).orderBy(
        _c("chrom").asc_nulls_last(),
        _c("start").asc_nulls_last(),
        F.xxhash64(*[F.col(c) for c in df.columns]).asc(),
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def dedup_exons(df: DataFrame) -> DataFrame:
    """Cache-ingest exon dedup (reference ``test_build_query_exon_dedup``:
    ROW_NUMBER PARTITION BY transcript_id, exon_number), full-row content
    hash as the deterministic tie-break (duplicate spill rows share
    coordinates by construction)."""
    from pyspark.sql import Window

    def _c(name: str) -> "F.Column":
        return F.col(name) if name in df.columns else F.lit(None)

    w = Window.partitionBy("transcript_id", "exon_number").orderBy(
        _c("start").asc_nulls_last(),
        _c("end").asc_nulls_last(),
        F.xxhash64(*[F.col(c) for c in df.columns]).asc(),
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
