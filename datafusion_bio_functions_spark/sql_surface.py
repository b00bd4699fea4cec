"""SQL table-function surface — the reference's primary query API.

The reference registers its operators as DataFusion SQL UDTFs
(``bio-function-ranges/src/table_function.rs:835-895``,
``bio-function-pileup/src/table_function.rs:155-158``) so users write

    SELECT * FROM overlap('reads', 'targets', 'strict')
    SELECT * FROM nearest('a', 'b', 2, false)
    SELECT * FROM merge('intervals', 10)

Spark has no SQL-registrable *table* functions over catalog tables, so
``bio_sql`` provides the same surface by rewriting: each ``udtf('t', ...)``
call site in the query text is evaluated through the corresponding
DataFrame operator (resolving table names via ``spark.table``, i.e. any
temp view or catalog table), bound to a generated temp view, and the call
text replaced by the view name; the rewritten statement then runs through
``spark.sql`` unchanged — so UDTF calls compose with ordinary SQL (CTEs,
joins, filters, aggregates) exactly as in the reference.

Argument conventions mirror ``table_function.rs:59-259``:

* two leading table names (one for merge/cluster/complement/depth),
* optional 3 or 6 column names (``table_function.rs:150-189``),
* merge/cluster: optional leading ``min_dist`` integer (``:236-259``),
* nearest: optional ``k`` int, ``include_overlaps`` / ``compute_distance``
  booleans (``:298-330``),
* overlap: trailing output-mode keyword ``join | left | left_distinct |
  left_all | left_multiple`` (``:108-146``),
* optional trailing ``'strict' | 'weak'`` everywhere,
* depth: table name + optional ``zero_based``, ``per_base`` booleans
  (``bio-function-pileup/src/table_function.rs:98-124``),
* annotate_vep: table names + trailing JSON options literal
  (``bio-function-vep/src/annotate_table_function.rs:19-132``; options keys
  here: ``match_mode, extended_probes, upstream_distance,
  downstream_distance, engine`` plus the reference's boolean flag
  families — transcript selection ``refseq/merged/gencode_basic/
  gencode_primary/all_refseq/exclude_predicted``, HGVS ``hgvs/hgvsc/
  hgvsp/no_escape/remove_hgvsp_version/hgvsp_use_prediction``,
  colocated ``check_existing/af/af_1kg/af_gnomade/af_gnomadg/max_af/
  pubmed`` and ``everything``),
* backticks in string args rejected (SQL-injection guard, ``:40-57``).
"""

from __future__ import annotations

import itertools
import json
import re

from pyspark.sql import DataFrame, SparkSession

from .operators import intervals as iv
from .operators import pileup as pu
from .operators import vep as vp

#: UDTF names served by :func:`bio_sql` — the reference's registration list.
UDTF_NAMES = (
    "count_overlaps",
    "coverage",
    "nearest",
    "overlap",
    "merge",
    "cluster",
    "complement",
    "subtract",
    "depth",
    "lookup_variants",
    "annotate_vep",
)

_DEFAULT_COLS = ("contig", "pos_start", "pos_end")
_CALL_RE = re.compile(r"\b(" + "|".join(UDTF_NAMES) + r")\s*\(", re.IGNORECASE)
_VIEW_SEQ = itertools.count()


class BioSqlError(ValueError):
    """Argument/parse error in a bio UDTF call (mirrors DataFusion Plan errors)."""


# ---------------------------------------------------------------------------
# literal-argument tokenizer
# ---------------------------------------------------------------------------


def _scan_call(query: str, open_paren: int) -> tuple[list[object], int]:
    """Parse the literal argument list starting after ``(`` at *open_paren*.

    Returns (args, index_after_close_paren).  Only literals are accepted —
    the reference takes UDTF args as literal ``Expr``s at plan time.
    """
    i = open_paren + 1
    args: list[object] = []
    expect_value = True
    while i < len(query):
        c = query[i]
        if c.isspace():
            i += 1
            continue
        if c == ")":
            if expect_value and args:
                raise BioSqlError("trailing comma in bio UDTF argument list")
            return args, i + 1
        if c == ",":
            if expect_value:
                raise BioSqlError("empty argument in bio UDTF call")
            expect_value = True
            i += 1
            continue
        if not expect_value:
            raise BioSqlError(f"expected ',' or ')' at position {i} in bio UDTF call")
        if c == "'":
            j = i + 1
            buf = []
            while j < len(query):
                if query[j] == "'":
                    if j + 1 < len(query) and query[j + 1] == "'":  # '' escape
                        buf.append("'")
                        j += 2
                        continue
                    break
                buf.append(query[j])
                j += 1
            else:
                raise BioSqlError("unterminated string literal in bio UDTF call")
            val = "".join(buf)
            if "`" in val:
                # table_function.rs:46-50 — injection guard
                raise BioSqlError(
                    f"bio UDTF string argument must not contain backticks, got: {val}"
                )
            args.append(val)
            i = j + 1
        else:
            m = re.match(r"[+-]?\d+(\.\d+)?|true|false|TRUE|FALSE|True|False", query[i:])
            if not m:
                raise BioSqlError(
                    f"bio UDTF arguments must be literals, got {query[i:i+20]!r}"
                )
            tok = m.group(0)
            if tok.lower() == "true":
                args.append(True)
            elif tok.lower() == "false":
                args.append(False)
            elif m.group(1):
                args.append(float(tok))
            else:
                args.append(int(tok))
            i += len(tok)
        expect_value = False
    raise BioSqlError("unterminated bio UDTF call (missing ')')")


# ---------------------------------------------------------------------------
# reference argument-pattern parsers (table_function.rs:59-259)
# ---------------------------------------------------------------------------


def _strs(args: list[object], what: str) -> list[str]:
    bad = [a for a in args if not isinstance(a, str)]
    if bad:
        raise BioSqlError(f"{what} must be string literals, got {bad[0]!r}")
    return list(args)  # type: ignore[arg-type]


def _pop_filter_op(extra: list[object]) -> tuple[list[object], str]:
    if extra and isinstance(extra[-1], str) and extra[-1].lower() in ("strict", "weak"):
        return extra[:-1], extra[-1].lower()
    return extra, "weak"


def _col_triples(
    col_args: list[object], fn_name: str
) -> tuple[tuple[str, ...] | None, tuple[str, ...] | None]:
    if not col_args:
        return None, None
    cols = _strs(col_args, f"{fn_name}() column names")
    if len(cols) == 3:
        return tuple(cols), tuple(cols)
    if len(cols) == 6:
        return tuple(cols[:3]), tuple(cols[3:])
    raise BioSqlError(
        f"{fn_name}() expects 0, 3, or 6 column name arguments (got {len(cols)})"
    )


def _pop_min_dist(extra: list[object]) -> tuple[int, list[object]]:
    if extra and isinstance(extra[0], int) and not isinstance(extra[0], bool):
        if extra[0] < 0:
            raise BioSqlError(f"min_dist must be >= 0, got {extra[0]}")
        return extra[0], extra[1:]
    return 0, extra


def _two_tables(args: list[object], fn_name: str) -> tuple[str, str, list[object]]:
    if len(args) < 2 or not isinstance(args[0], str) or not isinstance(args[1], str):
        raise BioSqlError(
            f"{fn_name}() requires at least 2 arguments: left_table and right_table names"
        )
    return args[0], args[1], args[2:]


# ---------------------------------------------------------------------------
# per-function dispatch
# ---------------------------------------------------------------------------


def _eval_udtf(spark: SparkSession, name: str, args: list[object]) -> DataFrame:
    name = name.lower()
    if name in ("count_overlaps", "coverage", "subtract"):
        lt, rt, extra = _two_tables(args, name)
        extra, op = _pop_filter_op(extra)
        cl, cr = _col_triples(extra, name)
        fn = {"count_overlaps": iv.count_overlaps, "coverage": iv.coverage,
              "subtract": iv.subtract}[name]
        return fn(spark.table(lt), spark.table(rt), cols_left=cl, cols_right=cr,
                  filter_op=op)

    if name == "overlap":
        lt, rt, extra = _two_tables(args, name)
        # trailing keyword pops, each at most once, any order (:108-146)
        output, op = "join", "weak"
        has_op = has_mode = False
        while len(extra) not in (0, 3, 6) and extra and isinstance(extra[-1], str):
            kw = extra[-1].lower()
            if kw in ("strict", "weak") and not has_op:
                op, has_op = kw, True
            elif kw in ("left", "left_distinct") and not has_mode:
                output, has_mode = "left_distinct", True
            elif kw in ("left_all", "left_multiple") and not has_mode:
                output, has_mode = "left_all", True
            elif kw == "join" and not has_mode:
                output, has_mode = "join", True
            else:
                break
            extra = extra[:-1]
        cl, cr = _col_triples(extra, name)
        return iv.overlap(spark.table(lt), spark.table(rt), cols_left=cl,
                          cols_right=cr, filter_op=op, output=output)

    if name == "nearest":
        lt, rt, extra = _two_tables(args, name)
        k = 1
        if extra and isinstance(extra[0], int) and not isinstance(extra[0], bool):
            k = extra[0]
            if k < 1:
                raise BioSqlError("nearest() k must be >= 1")
            extra = extra[1:]
        include_overlaps = compute_distance = True
        if extra and isinstance(extra[0], bool):
            include_overlaps, extra = extra[0], extra[1:]
        if extra and isinstance(extra[0], bool):
            compute_distance, extra = extra[0], extra[1:]
        extra, op = _pop_filter_op(extra)
        cl, cr = _col_triples(extra, name)
        return iv.nearest(spark.table(lt), spark.table(rt), k=k, cols_left=cl,
                          cols_right=cr, include_overlaps=include_overlaps,
                          compute_distance=compute_distance, filter_op=op)

    if name in ("merge", "cluster"):
        if not args or not isinstance(args[0], str):
            raise BioSqlError(f"{name}() requires at least 1 argument: table name")
        t, extra = args[0], args[1:]
        min_dist, extra = _pop_min_dist(extra)
        extra, op = _pop_filter_op(extra)
        cols = tuple(_strs(extra, f"{name}() column names")) if extra else None
        if cols is not None and len(cols) != 3:
            raise BioSqlError(f"{name}() expects 0 or 3 column name arguments")
        fn = iv.merge if name == "merge" else iv.cluster
        return fn(spark.table(t), min_dist=min_dist, cols=cols, filter_op=op)

    if name == "complement":
        if not args or not isinstance(args[0], str):
            raise BioSqlError("complement() requires at least 1 argument: table name")
        t, extra = args[0], args[1:]
        extra, op = _pop_filter_op(extra)
        strs = _strs(extra, "complement() arguments")
        # count-based view disambiguation (table_function.rs:626-700):
        # 0 → no view; 1 → view; 3 → cols; 4 → view+cols; 6 → cols_l+cols_v?
        view = None
        cols = view_cols = None
        if len(strs) == 1:
            view = strs[0]
        elif len(strs) == 3:
            cols = tuple(strs)
        elif len(strs) == 4:
            view, cols = strs[0], tuple(strs[1:])
        elif len(strs) == 7:
            view, cols, view_cols = strs[0], tuple(strs[1:4]), tuple(strs[4:])
        elif strs:
            raise BioSqlError(
                "complement() expects ('t'[,'view'][,3 cols[,3 view cols]][,op])"
            )
        vdf = spark.table(view) if view else None
        return iv.complement(spark.table(t), view=vdf, cols=cols,
                             view_cols=view_cols, filter_op=op)

    if name == "depth":
        if not args or not isinstance(args[0], str):
            raise BioSqlError(
                "depth() requires at least one argument: the alignments table"
            )
        t, extra = args[0], args[1:]
        zero_based = per_base = False
        if extra:
            if not isinstance(extra[0], bool):
                raise BioSqlError("depth() second argument must be a boolean (zero_based)")
            zero_based, extra = extra[0], extra[1:]
        if extra:
            if not isinstance(extra[0], bool):
                raise BioSqlError("depth() third argument must be a boolean (per_base)")
            per_base, extra = extra[0], extra[1:]
        if extra:
            raise BioSqlError("depth() takes at most 3 arguments")
        return pu.depth(spark.table(t), zero_based=zero_based, per_base=per_base)

    if name == "lookup_variants":
        # reference order (table_function.rs:26,80-117):
        # (vcf, cache [, columns_csv [, match_mode [, extended_probes]]])
        vt, ct, extra = _two_tables(args, name)
        columns = None
        match_mode, extended = "exact", False
        if extra and isinstance(extra[0], str):
            col_str = extra[0].strip()
            columns = [c.strip() for c in col_str.split(",") if c.strip()] or None
            extra = extra[1:]
        if extra and isinstance(extra[0], str):
            match_mode, extra = extra[0], extra[1:]
        if extra and isinstance(extra[0], bool):
            extended, extra = extra[0], extra[1:]
        if extra:
            raise BioSqlError("lookup_variants() unexpected extra arguments")
        return vp.lookup_variants(spark.table(vt), spark.table(ct), columns=columns,
                                  match_mode=match_mode, extended_probes=extended)

    if name == "annotate_vep":
        vt, ct, extra = _two_tables(args, name)
        # trailing JSON options literal, as the reference's options_json arg
        opts: dict[str, object] = {}
        if extra and isinstance(extra[-1], str) and extra[-1].lstrip().startswith("{"):
            try:
                opts = json.loads(extra[-1])
            except json.JSONDecodeError as e:
                raise BioSqlError(f"annotate_vep() options_json is not valid JSON: {e}")
            if not isinstance(opts, dict):
                raise BioSqlError("annotate_vep() options_json must be a JSON object")
            extra = extra[:-1]
        tables = _strs(extra, "annotate_vep() context table names")
        if len(tables) > 2:
            raise BioSqlError(
                "annotate_vep() expects ('vcf','cache'[,'transcripts'[,'exons']]"
                "[, options_json])"
            )
        tdf = spark.table(tables[0]) if len(tables) >= 1 else None
        edf = spark.table(tables[1]) if len(tables) == 2 else None
        # reference options_json boolean families, parsed from the SAME
        # top-level object (TranscriptSelectionFlags/HgvsFlags/VepFlags
        # .from_options_json, annotate_provider.rs:1110-1296) and mapped
        # to the matching annotate_vep() keyword groups
        _sel_keys = {"refseq", "merged", "gencode_basic", "gencode_primary",
                     "all_refseq", "exclude_predicted"}
        _hgvs_keys = {"hgvs", "hgvsc", "hgvsp", "shift_hgvs", "no_escape",
                      "remove_hgvsp_version", "hgvsp_use_prediction"}
        _vep_keys = {"check_existing", "af", "af_1kg", "af_gnomade",
                     "af_gnomadg", "max_af", "pubmed"}
        # the reference's physical-layout knobs (annotate_provider.rs
        # options_json keys): partitioned/use_fjall pick its storage
        # backend and buffer_size its batch window — all meaningless on
        # Spark (parquet + Catalyst own those decisions), tolerated so a
        # reference options object runs unchanged
        _layout_noops = {"partitioned", "use_fjall", "buffer_size"}
        allowed = (
            {"match_mode", "extended_probes", "upstream_distance",
             "downstream_distance", "distance", "engine", "full_schema",
             "regulatory", "motifs", "structural", "mirnas",
             "translations", "sift", "translations_sift_table",
             "reference_fasta_path", "everything", "failed"}
            | _sel_keys | _hgvs_keys | _vep_keys | _layout_noops
        )
        bad = set(opts) - allowed
        if bad:
            raise BioSqlError(
                f"annotate_vep() unknown options_json keys: {sorted(bad)}"
            )
        if "reference_fasta_path" in opts:
            # the reference REQUIRES this whenever HGVS flags are on
            # (validate_hgvs_reference_fasta); here it feeds the genomic
            # 3'-shift state via annotate_vep(reference_genome=...) — the
            # FASTA loads driver-side once and broadcasts
            from .sources.readers import load_fasta

            fasta_path = opts.pop("reference_fasta_path")
            try:
                opts["reference_genome"] = load_fasta(fasta_path)
            except OSError as e:
                raise BioSqlError(
                    f"annotate_vep() reference_fasta_path unreadable: {e}"
                ) from e
        for k in _layout_noops:
            opts.pop(k, None)
        if "translations_sift_table" in opts:
            # the reference's key naming its SIFT/PolyPhen prediction table
            # maps onto the relational sift= context arm
            opts.setdefault("sift", opts.pop("translations_sift_table"))
        if "distance" in opts:
            # VEP --distance: a non-negative int (or numeric string) sets
            # both windows; an "up,down" pair string sets them separately
            # (reference parse_json_distance_option,
            # annotate_provider.rs:2386-2410; invalid values fall back to
            # the 5000/5000 default exactly as the reference's
            # unwrap_or does)
            raw = opts.pop("distance")
            parts = (
                [raw]
                if isinstance(raw, (int, float)) and not isinstance(raw, bool)
                else [p.strip() for p in str(raw).split(",")]
            )

            def _part(v):
                # integers only — a fractional or boolean value is INVALID
                # (falls back to the 5000/5000 default like the reference's
                # unwrap_or), never silently truncated to a tiny window
                if isinstance(v, bool) or (
                    isinstance(v, float) and not v.is_integer()
                ):
                    return None
                try:
                    n = int(v)
                except (TypeError, ValueError):
                    return None
                return n if n >= 0 else None

            vals = [_part(p) for p in parts]
            if len(vals) == 1 and vals[0] is not None:
                opts["upstream_distance"] = opts["downstream_distance"] = vals[0]
            elif len(vals) == 2 and None not in vals:
                opts["upstream_distance"], opts["downstream_distance"] = vals
        # boolean-family values coerce by CONTENT through the same
        # _opt_bool the flag classes use (a quoted "0"/"false" means off —
        # naive bool() silently inverted it); bad values surface as the
        # SQL seam's own error type
        def _sql_bool(key, v):
            try:
                return vp._opt_bool(v)
            except ValueError:
                raise BioSqlError(
                    f"annotate_vep() option {key!r} expects a boolean, got {v!r}"
                )

        everything = _sql_bool("everything", opts.pop("everything", False))
        sel = {k: _sql_bool(k, opts.pop(k)) for k in list(opts) if k in _sel_keys}
        hgvs = {k: _sql_bool(k, opts.pop(k)) for k in list(opts) if k in _hgvs_keys}
        vepf = {k: _sql_bool(k, opts.pop(k)) for k in list(opts) if k in _vep_keys}
        if everything:
            hgvs["everything"] = vepf["everything"] = True
            opts["csq_everything"] = True
        if sel:
            opts["transcript_selection"] = sel
        if hgvs or everything:
            opts["hgvs_options"] = hgvs
        if vepf or everything:
            opts["vep_options"] = vepf
        if "failed" in opts:
            # reference options_json key "failed" → allowed_failed
            # (variant_lookup_exec.rs QC filter threshold)
            opts["allowed_failed"] = int(opts.pop("failed"))
        # context-feature arms name registered tables (the reference resolves
        # the same arms from its partitioned-cache layout by convention:
        # regulatory/ motif/ structural/, annotate_provider.rs:8198-8209)
        for key in ("regulatory", "motifs", "structural", "mirnas", "translations", "sift"):
            if key in opts:
                name = opts[key]
                if not isinstance(name, str) or "`" in name:
                    raise BioSqlError(f"annotate_vep() option {key!r} must be a table name")
                opts[key] = spark.table(name)
        return vp.annotate_vep(spark.table(vt), spark.table(ct), transcripts=tdf,
                               exons=edf, **opts)

    raise BioSqlError(f"unknown bio UDTF {name!r}")  # pragma: no cover


# ---------------------------------------------------------------------------
# query rewriting
# ---------------------------------------------------------------------------


def _in_string(query: str, pos: int) -> bool:
    """True if *pos* falls inside a single-quoted SQL string literal."""
    return query.count("'", 0, pos) % 2 == 1


def bio_sql(spark: SparkSession, query: str) -> DataFrame:
    """Run a SQL statement that may call bio table functions.

    Each ``udtf(...)`` call site is evaluated via the matching DataFrame
    operator and substituted with a temp view; a canonical range join in
    the remaining statement is transparently rerouted through the interval
    join (the reference's ``IntervalJoinPhysicalOptimizationRule``
    capability — see :mod:`..plans.range_join`); everything else is Spark
    SQL.
    """
    from .plans.range_join import rewrite_range_joins

    out = []
    pos = 0
    while True:
        m = _CALL_RE.search(query, pos)
        if not m:
            out.append(query[pos:])
            break
        if _in_string(query, m.start()):
            out.append(query[pos:m.end()])
            pos = m.end()
            continue
        args, after = _scan_call(query, query.index("(", m.start()))
        df = _eval_udtf(spark, m.group(1), args)
        view = f"__bio_udtf_{next(_VIEW_SEQ)}"
        df.createOrReplaceTempView(view)
        out.append(query[pos:m.start()])
        out.append(view)
        pos = after
    return spark.sql(rewrite_range_joins(spark, "".join(out)))
