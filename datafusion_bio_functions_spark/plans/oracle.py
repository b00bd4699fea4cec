"""ANSI-SQL oracle formulations of every interval operator.

These strings are the *generic-SQL semantics contract*: DuckDB runs them
side-by-side with the Spark operators (driver CORRECTNESS gate + pytest).
They intentionally use only portable constructs (windows, greatest/least,
row_number) so the same text also documents what each operator computes.

Each builder takes table names (or subquery text) + the 3 interval column
names and returns a SELECT.  ``filter_op`` follows the reference semantics
(weak = 1-based closed ``<=``, strict = ``<``; merge boundary per
``merge.rs:290-297``).
"""

from __future__ import annotations

from typing import Sequence

DEFAULT_COLS = ("contig", "pos_start", "pos_end")


def _c3(cols: Sequence[str] | None) -> tuple[str, str, str]:
    c, s, e = cols or DEFAULT_COLS
    return c, s, e


def _ov(lc, ls, le, rc, rs, re, op: str) -> str:
    lt = "<=" if op == "weak" else "<"
    gt = ">=" if op == "weak" else ">"
    return f"{lc} = {rc} AND {ls} {lt} {re} AND {le} {gt} {rs}"


def overlap_sql(
    l: str,
    r: str,
    l_cols: Sequence[str] | None = None,
    r_cols: Sequence[str] | None = None,
    l_all: Sequence[str] | None = None,
    r_all: Sequence[str] | None = None,
    filter_op: str = "weak",
) -> str:
    lc, ls, le = _c3(l_cols)
    rc, rs, re = _c3(r_cols)
    l_all = list(l_all or (lc, ls, le))
    r_all = list(r_all or (rc, rs, re))
    proj = ", ".join(
        [f"l.{c} AS left_{c}" for c in l_all] + [f"r.{c} AS right_{c}" for c in r_all]
    )
    return (
        f"SELECT {proj} FROM ({l}) l JOIN ({r}) r ON "
        + _ov(f"l.{lc}", f"l.{ls}", f"l.{le}", f"r.{rc}", f"r.{rs}", f"r.{re}", filter_op)
    )


def _islands_cte(t: str, c: str, s: str, e: str, min_dist: int, filter_op: str) -> str:
    """Shared gaps-and-islands CTE body producing (c, s, e, island, ...)."""
    brk_cmp = ">" if filter_op == "weak" else ">="  # break when NOT merged
    return f"""
  __w AS (
    SELECT *, max({e}) OVER (PARTITION BY {c} ORDER BY {s}, {e}
                             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS __prev_max
    FROM ({t})
  ),
  __i AS (
    SELECT *, sum(CASE WHEN __prev_max IS NULL OR {s} {brk_cmp} __prev_max + {min_dist}
                       THEN 1 ELSE 0 END)
              OVER (PARTITION BY {c} ORDER BY {s}, {e}
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS __island
    FROM __w
  )"""


def merge_sql(
    t: str, cols: Sequence[str] | None = None, min_dist: int = 0, filter_op: str = "weak"
) -> str:
    c, s, e = _c3(cols)
    return f"""WITH {_islands_cte(t, c, s, e, min_dist, filter_op)}
SELECT {c} AS contig, CAST(min({s}) AS BIGINT) AS pos_start,
       CAST(max({e}) AS BIGINT) AS pos_end, count(*) AS n_intervals
FROM __i GROUP BY {c}, __island"""


def cluster_sql(
    t: str,
    cols: Sequence[str] | None = None,
    all_cols: Sequence[str] | None = None,
    min_dist: int = 0,
    filter_op: str = "weak",
) -> str:
    c, s, e = _c3(cols)
    all_cols = list(all_cols or (c, s, e))
    proj = ", ".join(all_cols)
    return f"""WITH {_islands_cte(t, c, s, e, min_dist, filter_op)},
__a AS (
  SELECT *, CAST(min({s}) OVER (PARTITION BY {c}, __island) AS BIGINT) AS cluster_start,
            CAST(max({e}) OVER (PARTITION BY {c}, __island) AS BIGINT) AS cluster_end
  FROM __i
)
SELECT {proj},
       CAST(dense_rank() OVER (ORDER BY {c}, cluster_start, __island) - 1 AS BIGINT) AS cluster,
       cluster_start, cluster_end
FROM __a"""


def count_overlaps_sql(
    l: str,
    r: str,
    l_cols: Sequence[str] | None = None,
    r_cols: Sequence[str] | None = None,
    r_all: Sequence[str] | None = None,
    filter_op: str = "weak",
) -> str:
    lc, ls, le = _c3(l_cols)
    rc, rs, re = _c3(r_cols)
    r_all = list(r_all or (rc, rs, re))
    proj = ", ".join(f"rr.{c}" for c in r_all)
    grp = ", ".join(["rr.__rid"] + [f"rr.{c}" for c in r_all])
    return f"""WITH rr AS (SELECT *, row_number() OVER () AS __rid FROM ({r}))
SELECT {proj}, CAST(count(ll.{lc}) AS BIGINT) AS count
FROM rr LEFT JOIN ({l}) ll
  ON {_ov(f'll.{lc}', f'll.{ls}', f'll.{le}', f'rr.{rc}', f'rr.{rs}', f'rr.{re}', filter_op)}
GROUP BY {grp}"""


def coverage_sql(
    l: str,
    r: str,
    l_cols: Sequence[str] | None = None,
    r_cols: Sequence[str] | None = None,
    r_all: Sequence[str] | None = None,
    filter_op: str = "weak",
) -> str:
    lc, ls, le = _c3(l_cols)
    rc, rs, re = _c3(r_cols)
    r_all = list(r_all or (rc, rs, re))
    proj = ", ".join(f"rr.{c}" for c in r_all)
    grp = ", ".join(["rr.__rid"] + [f"rr.{c}" for c in r_all])
    # reference contribution per merged interval, shrink-adjusted query:
    # max(1, min(q_end + 1, iv_end) - max(q_start - 1, iv_start))
    # (interval_tree.rs:148); pre-merge always uses the touching condition
    sh = 0 if filter_op == "weak" else 1
    merged = merge_sql(l, (lc, ls, le), 0, "weak")
    return f"""WITH rr AS (SELECT *, row_number() OVER () AS __rid FROM ({r})),
mm AS ({merged})
SELECT {proj},
       CAST(coalesce(sum(CASE WHEN mm.pos_start IS NULL THEN NULL
            ELSE greatest(1, least(mm.pos_end, rr.{re} - {sh} + 1) - greatest(mm.pos_start, rr.{rs} + {sh} - 1)) END), 0) AS BIGINT) AS coverage
FROM rr LEFT JOIN mm
  ON {_ov('mm.contig', 'mm.pos_start', 'mm.pos_end', f'rr.{rc}', f'rr.{rs}', f'rr.{re}', filter_op)}
GROUP BY {grp}"""


def complement_sql(
    t: str,
    view: str | None = None,
    cols: Sequence[str] | None = None,
    view_cols: Sequence[str] | None = None,
    min_dist: int = 0,
    filter_op: str = "weak",
) -> str:
    c, s, e = _c3(cols)
    vc, vs, ve = _c3(view_cols)
    merged = merge_sql(t, cols, min_dist, filter_op)
    if view is None:
        bounds = (
            "SELECT contig, CAST(0 AS BIGINT) AS __vstart, "
            "CAST(9223372036854775807 AS BIGINT) AS __vend "
            "FROM (SELECT DISTINCT contig FROM mm)"
        )
        whole = ""
    else:
        bounds = (
            f"SELECT {vc} AS contig, CAST({vs} AS BIGINT) AS __vstart, "
            f"CAST({ve} AS BIGINT) AS __vend FROM ({view})"
        )
        whole = """
UNION ALL
SELECT b.contig, b.__vstart AS pos_start, b.__vend AS pos_end
FROM bounds b LEFT JOIN (SELECT DISTINCT contig FROM mm) o USING (contig)
WHERE o.contig IS NULL"""
    return f"""WITH mm AS ({merged}),
bounds AS ({bounds}),
mb AS (
  SELECT mm.*, b.__vstart, b.__vend,
         lag(mm.pos_end) OVER (PARTITION BY mm.contig ORDER BY mm.pos_start, mm.pos_end) AS __prev_end,
         row_number() OVER (PARTITION BY mm.contig ORDER BY mm.pos_start DESC, mm.pos_end DESC) AS __rn_desc
  FROM mm JOIN bounds b ON mm.contig = b.contig
  WHERE mm.pos_start <= b.__vend AND mm.pos_end >= b.__vstart
)
SELECT contig, pos_start, pos_end FROM (
  SELECT contig,
         greatest(coalesce(__prev_end, __vstart), __vstart) AS pos_start,
         least(pos_start, __vend) AS pos_end
  FROM mb
  UNION ALL
  SELECT contig, greatest(pos_end, __vstart) AS pos_start, __vend AS pos_end
  FROM mb WHERE __rn_desc = 1{whole}
) WHERE pos_start < pos_end"""


def subtract_sql(
    l: str,
    r: str,
    l_cols: Sequence[str] | None = None,
    r_cols: Sequence[str] | None = None,
    l_all: Sequence[str] | None = None,
    filter_op: str = "weak",
) -> str:
    lc, ls, le = _c3(l_cols)
    rc, rs, re = _c3(r_cols)
    l_all = list(l_all or (lc, ls, le))
    other = [c for c in l_all if c not in (ls, le)]
    proj_other = "".join(f"lw.{c}, " for c in other)
    merged = merge_sql(r, (rc, rs, re), 0, filter_op)
    sel = ", ".join(
        [c for c in other] + [f"CAST({ls} AS BIGINT) AS {ls}", f"CAST({le} AS BIGINT) AS {le}"]
    )
    out_cols = ", ".join(l_all)
    # end-exclusive fragment arithmetic (reference subtract.rs:414-438):
    # gaps are (cursor, rs) / (cursor, le) with cursor = max(ls, prev re),
    # no ±1, and empty (start >= end) outputs dropped — incl. degenerate
    # unmatched left rows
    return f"""WITH lw AS (SELECT *, row_number() OVER () AS __lid FROM ({l})),
mm AS ({merged}),
j AS (
  SELECT lw.*, mm.pos_start AS __ms, mm.pos_end AS __me
  FROM lw LEFT JOIN mm
    ON {_ov('mm.contig', 'mm.pos_start', 'mm.pos_end', f'lw.{lc}', f'lw.{ls}', f'lw.{le}', filter_op)}
),
ovl AS (
  SELECT *, lag(__me) OVER (PARTITION BY __lid ORDER BY __ms) AS __prev_me,
         row_number() OVER (PARTITION BY __lid ORDER BY __ms DESC) AS __rn_desc
  FROM j WHERE __ms IS NOT NULL
),
frags AS (
  SELECT {', '.join(f'{c}' for c in other)}, {ls}, {le} FROM (
    SELECT {proj_other}lw.{ls}, lw.{le} FROM (SELECT * FROM j WHERE __ms IS NULL) lw
    UNION ALL
    SELECT {''.join(f'{c}, ' for c in other)}greatest(coalesce(__prev_me, {ls}), {ls}) AS {ls}, __ms AS {le} FROM ovl
    UNION ALL
    SELECT {''.join(f'{c}, ' for c in other)}greatest(__me, {ls}) AS {ls}, {le} FROM ovl WHERE __rn_desc = 1
  ) WHERE {ls} < {le}
)
SELECT {sel} FROM frags""".replace("SELECT , ", "SELECT ")


def nearest_sql(
    l: str,
    r: str,
    l_cols: Sequence[str] | None = None,
    r_cols: Sequence[str] | None = None,
    l_all: Sequence[str] | None = None,
    r_all: Sequence[str] | None = None,
    k: int = 1,
    filter_op: str = "weak",
    include_overlaps: bool = True,
) -> str:
    """Brute-force k-nearest oracle: per probe (right) row rank all same-
    contig left intervals by (distance, start, end).  O(n·m) — oracle only.
    ``include_overlaps=False`` restricts candidates to distance > 0 (the
    reference's overlap toggle, ``nearest.rs:29-547``)."""
    lc, ls, le = _c3(l_cols)
    rc, rs, re = _c3(r_cols)
    l_all = list(l_all or (lc, ls, le))
    r_all = list(r_all or (rc, rs, re))
    shrink = 0 if filter_op == "weak" else 1
    dist = f"greatest(ll.{ls} - (rr.{re} - {shrink}), (rr.{rs} + {shrink}) - ll.{le}, 0)"
    extra_on = "" if include_overlaps else f" AND {dist} > 0"
    proj = ", ".join(
        [f"ll.{c} AS left_{c}" for c in l_all]
        + [f"rr.{c} AS right_{c}" for c in r_all]
        + [f"CAST({dist} AS BIGINT) AS distance"]
    )
    return f"""WITH rr AS (SELECT *, row_number() OVER () AS __rid FROM ({r})),
cand AS (
  SELECT {proj}, rr.__rid,
         row_number() OVER (
           PARTITION BY rr.__rid
           ORDER BY {dist} NULLS LAST,
                    ll.{ls}, ll.{le}) AS __rn
  FROM rr LEFT JOIN ({l}) ll ON ll.{lc} = rr.{rc}{extra_on}
)
SELECT * EXCLUDE (__rid, __rn) FROM cand WHERE __rn <= {k}"""


def depth_blocks_sql(alignments: str, chrom: str = "chrom", start: str = "start", ref_len: str = "ref_len") -> str:
    """Coverage blocks oracle for simple all-match alignments: the input
    subquery must expose (chrom, start [1-based], ref_len) of reads that pass
    filters.  Event algebra: +1 at start, −1 at start+ref_len; running sum;
    RLE blocks between consecutive breakpoints with coverage > 0."""
    return f"""WITH ev AS (
  SELECT {chrom} AS contig, {start} AS pos, 1 AS delta FROM ({alignments})
  UNION ALL
  SELECT {chrom} AS contig, {start} + {ref_len} AS pos, -1 AS delta FROM ({alignments})
),
agg AS (SELECT contig, pos, sum(delta) AS delta FROM ev GROUP BY contig, pos
        HAVING sum(delta) <> 0),
cum AS (
  SELECT contig, pos,
         CAST(sum(delta) OVER (PARTITION BY contig ORDER BY pos
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS coverage,
         lead(pos) OVER (PARTITION BY contig ORDER BY pos) AS next_pos
  FROM agg
)
SELECT contig, CAST(pos AS BIGINT) AS pos_start, CAST(next_pos - 1 AS BIGINT) AS pos_end, coverage
FROM cum WHERE coverage > 0 AND next_pos IS NOT NULL"""


# ---------------------------------------------------------------------------
# LLM-pipeline operator oracles (documents / embeddings tables)
# ---------------------------------------------------------------------------


def text_stats_sql(t: str, text_col: str = "text", keep: Sequence[str] = ("doc_id",)) -> str:
    """Mirror of ``functions.text.text_stats`` — identical expression tree so
    doubles match bit-for-bit (DuckDB regexp_replace needs the 'g' flag to
    match Spark's replace-all)."""
    c = text_col
    keep_proj = ", ".join(keep)
    return f"""WITH s AS (
  SELECT {keep_proj},
         CAST(length({c}) AS BIGINT) AS n_chars,
         CAST(CASE WHEN length(trim({c})) = 0 THEN 0
              ELSE len(string_split({c}, ' ')) END AS BIGINT) AS n_tokens,
         CAST(length(regexp_replace({c}, '[^A-Za-z]', '', 'g')) AS BIGINT) AS n_alpha,
         len(list_distinct(string_split({c}, ' '))) AS __nd,
         length(replace({c}, ' ', '')) AS __nsp
  FROM ({t})
)
SELECT {keep_proj}, n_chars, n_tokens, n_alpha,
       CASE WHEN n_tokens > 0 THEN __nd / n_tokens ELSE 0.0 END AS distinct_ratio,
       CASE WHEN n_tokens > 0 THEN __nsp / n_tokens ELSE 0.0 END AS mean_token_len,
       least(n_tokens / 50.0, 1.0) * 0.3
       + (CASE WHEN n_tokens > 0 THEN __nd / n_tokens ELSE 0.0 END) * 0.4
       + least((CASE WHEN n_tokens > 0 THEN __nsp / n_tokens ELSE 0.0 END) / 8.0, 1.0) * 0.3
         AS quality_score
FROM s"""


def lang_id_sql(
    t: str,
    text_col: str = "text",
    keep: Sequence[str] = ("doc_id",),
    profiles: Sequence[tuple[str, Sequence[str]]] | None = None,
) -> str:
    """Mirror of ``functions.text.lang_id``: first profile reaching the max
    marker-word score wins; all-zero → 'und'."""
    if profiles is None:
        from ..functions.text import DEFAULT_LANG_PROFILES as profiles  # type: ignore
    keep_proj = ", ".join(keep)

    def score(words):
        hits = " + ".join(
            f"(CASE WHEN contains(' ' || lower({text_col}) || ' ', ' {w} ') THEN 1 ELSE 0 END)"
            for w in words
        )
        return f"({hits})"

    scores = ", ".join(f"{score(words)} AS s_{lang}" for lang, words in profiles)
    gmax = "greatest(" + ", ".join(f"s_{lang}" for lang, _ in profiles) + ")"
    chain = " ".join(f"WHEN s_{lang} = __m THEN '{lang}'" for lang, _ in profiles)
    return f"""WITH s AS (SELECT {keep_proj}, {scores} FROM ({t})),
m AS (SELECT *, {gmax} AS __m FROM s)
SELECT {keep_proj}, CASE WHEN __m = 0 THEN 'und' {chain} END AS lang_pred FROM m"""


def exact_dedup_groups_sql(t: str, text_col: str = "text", id_col: str = "doc_id") -> str:
    """Mirror of ``operators.dedup.exact_dedup(output='groups')``."""
    fp = f"md5(lower(trim(regexp_replace({text_col}, '\\s+', ' ', 'g'))))"
    return f"""SELECT {fp} AS fingerprint, min({id_col}) AS keep_id, count(*) AS n_dups
FROM ({t}) GROUP BY {fp}"""


def cosine_topk_sql(
    queries: str,
    corpus: str,
    k: int = 10,
    query_id: str = "vec_id",
    corpus_id: str = "vec_id",
    vec: str = "embedding",
) -> str:
    """Mirror of ``operators.similarity.cosine_topk``: sequential double dot
    product (list_zip + list_transform + list_sum), rank by raw double with
    neighbor-id tie-break, self-matches excluded, raw double sim (bit-reproducible)."""
    dotexpr = (
        "list_sum(list_transform(list_zip(q.__qv, c.__cv), "
        "x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))"
    )

    def norm(alias, col):
        return (
            f"sqrt(list_sum(list_transform({alias}.{col}, "
            f"x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"
        )

    return f"""WITH q AS (SELECT {query_id} AS query_id, {vec} AS __qv FROM ({queries})),
c AS (SELECT {corpus_id} AS neighbor_id, {vec} AS __cv FROM ({corpus})),
sim AS (
  SELECT q.query_id, c.neighbor_id,
         {dotexpr} / ({norm('q', '__qv')} * {norm('c', '__cv')}) AS __sim
  FROM q CROSS JOIN c WHERE q.query_id <> c.neighbor_id
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY __sim DESC, neighbor_id ASC) AS rank
  FROM sim
)
SELECT query_id, neighbor_id, __sim AS cosine_sim, CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= {k}"""


def cosine_near_dup_sql(
    t: str, threshold: float, id_col: str = "vec_id", vec: str = "embedding"
) -> str:
    """Mirror of ``operators.similarity.cosine_near_dup_exact``."""
    dotexpr = (
        "list_sum(list_transform(list_zip(a.__va, b.__vb), "
        "x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))"
    )

    def norm(alias, col):
        return (
            f"sqrt(list_sum(list_transform({alias}.{col}, "
            f"x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"
        )

    return f"""WITH a AS (SELECT {id_col} AS id_a, {vec} AS __va FROM ({t})),
b AS (SELECT {id_col} AS id_b, {vec} AS __vb FROM ({t})),
sim AS (
  SELECT id_a, id_b,
         round({dotexpr} / ({norm('a', '__va')} * {norm('b', '__vb')}), 6) AS cosine_sim
  FROM a CROSS JOIN b WHERE id_a < id_b
)
SELECT id_a, id_b, cosine_sim FROM sim WHERE cosine_sim >= {threshold}"""


def bpe_tokens_sql(t: str, text_col: str = "text", keep: Sequence[str] = ("doc_id",)) -> str:
    """Mirror of ``functions.text.bpe_token_count`` (same RE2/Java-compatible
    regex; DuckDB string literal doubles the apostrophe)."""
    keep_proj = ", ".join(keep)
    pat = "''(?:[sdmt]|ll|ve|re)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\\s'']+"
    return (
        f"SELECT {keep_proj}, CAST(len(regexp_extract_all({text_col}, '{pat}')) AS BIGINT)"
        f" AS n_bpe_tokens FROM ({t})"
    )


def consequence_regions_sql(
    vcf: str,
    transcripts: str,
    upstream_distance: int = 5000,
    downstream_distance: int = 5000,
) -> str:
    """Mirror of ``operators.vep.consequence_regions`` — identical CASE
    cascade over the chrom + distance-window join.  Default distances are
    5 kb both sides, the reference engine default
    (TranscriptConsequenceEngine::new(5000, 5000))."""
    reach = max(upstream_distance, downstream_distance)
    return f"""WITH v AS ({vcf}), t AS ({transcripts})
SELECT * FROM (
SELECT v.chrom, v.start, v."end", v.ref, v.alt, t.transcript_id,
  CASE
    WHEN v."end" >= t.start AND v.start <= t."end" THEN
      CASE
        WHEN t.biotype <> 'protein_coding' THEN 'non_coding_transcript_variant'
        WHEN v."end" < t.cds_start THEN
          CASE WHEN t.strand >= 0 THEN '5_prime_UTR_variant' ELSE '3_prime_UTR_variant' END
        WHEN v.start > t.cds_end THEN
          CASE WHEN t.strand >= 0 THEN '3_prime_UTR_variant' ELSE '5_prime_UTR_variant' END
        ELSE 'coding_sequence_variant'
      END
    WHEN v."end" < t.start THEN
      CASE
        WHEN t.strand >= 0 AND t.start - v."end" <= {upstream_distance}
          THEN 'upstream_gene_variant'
        WHEN t.strand < 0 AND t.start - v."end" <= {downstream_distance}
          THEN 'downstream_gene_variant'
      END
    ELSE
      CASE
        WHEN t.strand >= 0 AND v.start - t."end" <= {downstream_distance}
          THEN 'downstream_gene_variant'
        WHEN t.strand < 0 AND v.start - t."end" <= {upstream_distance}
          THEN 'upstream_gene_variant'
      END
  END AS region_term
FROM v JOIN t ON v.chrom = t.chrom
  AND v."end" >= t.start - {reach} AND v.start <= t."end" + {reach}
) WHERE region_term IS NOT NULL"""


def jaccard_pairs_char_sql(
    t: str,
    k: int = 5,
    threshold: float = 0.9,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """Exact all-pairs char-k-shingle Jaccard ≥ threshold — the ground-truth
    definition the MinHash-LSH path (``dedup.minhash_dedup``) approximates.
    The size-ratio prune is lossless: J(A,B) ≤ min(|A|,|B|)/max(|A|,|B|)."""
    return f"""
WITH all_docs AS ({t}),
norm_docs AS (
  SELECT {id_col}, lower(trim(regexp_replace({text_col}, '\\s+', ' ', 'g'))) AS norm
  FROM all_docs
), sh AS (
  SELECT {id_col},
         list_distinct([substr(norm, i, {k})
                        FOR i IN range(1, greatest(length(norm) - {k - 1}, 1) + 1)]) AS grams
  FROM norm_docs
), pairs AS (
  SELECT a.{id_col} AS id_a, b.{id_col} AS id_b,
         len(list_intersect(a.grams, b.grams)) AS inter,
         len(a.grams) + len(b.grams) - len(list_intersect(a.grams, b.grams)) AS uni
  FROM sh a JOIN sh b
    ON a.{id_col} < b.{id_col}
   AND least(len(a.grams), len(b.grams)) >= {threshold} * greatest(len(a.grams), len(b.grams))
)
SELECT id_a, id_b, round(inter::DOUBLE / uni, 6) AS jaccard
FROM pairs WHERE inter::DOUBLE / uni >= {threshold}"""


def substring_dup_spans_sql(
    t: str,
    window: int = 50,
    stride: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """Ground truth for ``dedup.substring_dup_spans(output='doc_stats')``:
    windows on the actual SUBSTRINGS (no hashing), duplicated = the same
    window content in ≥2 distinct documents.  DuckDB range() is
    end-exclusive → +2 closes Spark's inclusive sequence bound."""
    return f"""
WITH all_docs AS ({t}),
norm_docs AS (
  SELECT {id_col}, lower(trim(regexp_replace({text_col}, '\\s+', ' ', 'g'))) AS norm
  FROM all_docs
), w AS (
  SELECT {id_col},
         unnest([substr(norm, i, {window})
                 FOR i IN range(1, length(norm) - {window} + 2, {stride})]) AS s
  FROM norm_docs
  WHERE length(norm) >= {window}
), d AS (
  SELECT s FROM w GROUP BY s HAVING count(DISTINCT {id_col}) >= 2
), totals AS (
  SELECT {id_col}, count(*) AS total_windows FROM w GROUP BY {id_col}
), dups AS (
  SELECT w.{id_col}, count(*) AS dup_windows
  FROM w JOIN d USING (s) GROUP BY w.{id_col}
)
SELECT t.{id_col}, t.total_windows,
       coalesce(u.dup_windows, 0) AS dup_windows,
       round(coalesce(u.dup_windows, 0)::DOUBLE / t.total_windows, 6) AS dup_ratio
FROM totals t LEFT JOIN dups u USING ({id_col})"""


def jaccard_pairs_word_sql(
    t: str,
    n: int = 3,
    threshold: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """Exact all-pairs word-n-gram Jaccard ≥ threshold — ground truth for
    ``dedup.ngram_jaccard_dedup``.  DuckDB list slice t[i:i+n-1] is 1-based
    inclusive → n elements."""
    return f"""
WITH all_docs AS ({t}),
toks AS (
  SELECT {id_col},
         string_split(lower(trim(regexp_replace({text_col}, '\\s+', ' ', 'g'))), ' ') AS t
  FROM all_docs
), sh AS (
  SELECT {id_col},
         list_distinct([array_to_string(t[i:i+{n - 1}], ' ')
                        FOR i IN range(1, greatest(len(t) - {n - 1}, 1) + 1)]) AS grams
  FROM toks
), pairs AS (
  SELECT a.{id_col} AS id_a, b.{id_col} AS id_b,
         len(list_intersect(a.grams, b.grams)) AS inter,
         len(a.grams) + len(b.grams) - len(list_intersect(a.grams, b.grams)) AS uni
  FROM sh a JOIN sh b
    ON a.{id_col} < b.{id_col}
   AND least(len(a.grams), len(b.grams)) >= {threshold} * greatest(len(a.grams), len(b.grams))
)
SELECT id_a, id_b, round(inter::DOUBLE / uni, 6) AS jaccard
FROM pairs WHERE inter::DOUBLE / uni >= {threshold}"""


def repetition_stats_sql(
    t: str, text_col: str = "text", id_col: str = "doc_id", n: int = 2
) -> str:
    """Mirror of ``functions.text.repetition_stats``: same tokenization
    (lower/trim/``\\s+`` split), same gram assembly (1-based n-slices joined
    by one space), same aggregates; docs with fewer than ``n`` words emit
    ``n_ngrams = 0`` with NULL fractions via the left join."""
    c, i = text_col, id_col
    return f"""WITH w AS (
  SELECT {i}, string_split_regex(lower(trim({c})), '\\s+') AS wds FROM ({t})
),
g AS (
  SELECT {i}, array_to_string(wds[idx : idx + {n - 1}], ' ') AS gram
  FROM w, UNNEST(generate_series(1, len(wds) - {n - 1})) AS u(idx)
  WHERE len(wds) >= {n}
),
gc AS (SELECT {i}, gram, count(*) AS c FROM g GROUP BY {i}, gram),
agg AS (
  SELECT {i}, SUM(c) AS n_ngrams, MAX(c) AS top,
         SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS dup
  FROM gc GROUP BY {i}
)
SELECT w.{i},
       CAST(coalesce(a.n_ngrams, 0) AS BIGINT) AS n_ngrams,
       CAST(coalesce(a.top, 0) AS BIGINT) AS top_ngram_count,
       a.top / a.n_ngrams AS top_ngram_frac,
       a.dup / a.n_ngrams AS dup_ngram_frac
FROM w LEFT JOIN agg a USING ({i})"""


def repetition_filter_sql(
    t: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 2,
    max_top_frac: float = 0.20,
    max_dup_frac: float = 0.60,
) -> str:
    """Mirror of ``functions.text.repetition_filter`` projected to the doc
    id: docs kept when they have no repetition signal or sit under both
    thresholds."""
    stats = repetition_stats_sql(t, text_col, id_col, n)
    return f"""SELECT {id_col} FROM ({stats})
WHERE top_ngram_frac IS NULL
   OR (top_ngram_frac <= {max_top_frac} AND dup_ngram_frac <= {max_dup_frac})"""


def semantic_dedup_keep_sql(
    t: str, threshold: float, id_col: str = "vec_id", vec: str = "embedding"
) -> str:
    """Mirror of ``operators.similarity.semantic_dedup(n_clusters=1,
    output='keep')`` projected to the id column: exhaustive rounded-cosine
    near-dup pairs (the candidate-complete twin considers every pair),
    connected components via a recursive CTE, keep the minimum id per
    component plus all untouched rows."""
    pairs = cosine_near_dup_sql(t, threshold, id_col=id_col, vec=vec)
    return f"""WITH RECURSIVE pairs AS ({pairs}),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION
  SELECT id_b AS src, id_a AS dst FROM pairs
),
reach (id, r) AS (
  SELECT src, src FROM edges
  UNION
  SELECT e.src, reach.r FROM edges e JOIN reach ON e.dst = reach.id
),
comp AS (SELECT id, min(r) AS component FROM reach GROUP BY id)
SELECT {id_col} FROM ({t})
WHERE {id_col} NOT IN (SELECT id FROM comp WHERE id <> component)"""


def lsh_cosine_topk_sql(
    queries: str,
    corpus: str,
    k: int = 10,
    dim: int = 64,
    n_planes: int = 6,
    n_tables: int = 8,
    multiprobe: bool = True,
    seed: int = 7,
    query_id: str = "vec_id",
    corpus_id: str = "vec_id",
    vec: str = "embedding",
) -> str:
    """Mirror of ``operators.similarity.lsh_cosine_topk`` — a FULL value
    oracle for the approximate path: the hyperplane draws are deterministic
    (``random.Random(seed)``), so they are embedded as DOUBLE list literals
    and DuckDB recomputes the sign-bit bucket ids, the (table, bucket)
    candidate equi-join (with Hamming-1 multiprobe on the query side), and
    the exact cosine rerank.  Every floating dot uses the same sequential
    left-to-right double summation idiom as :func:`cosine_topk_sql`
    (list_sum(list_transform(...))) — proven hash-identical to the Spark
    kernels by the exact-ANN gate rows — so bucket sign decisions and
    cosines are bit-reproducible."""
    from ..operators.similarity import _hyperplanes

    tables = [_hyperplanes(dim, n_planes, seed + 1000 * t) for t in range(n_tables)]

    def plane_lit(p):
        return "[" + ", ".join(repr(float(x)) for x in p) + "]"

    def dot_plane(col, p):
        return (
            f"list_sum(list_transform(list_zip({col}, {plane_lit(p)}), "
            f"x -> CAST(x[1] AS DOUBLE) * x[2]))"
        )

    def bucket_expr(col, planes):
        bits = [
            f"(CASE WHEN {dot_plane(col, p)} > 0 THEN {1 << i} ELSE 0 END)"
            for i, p in enumerate(planes)
        ]
        return "(" + " + ".join(bits) + ")"

    c_arms = "\nUNION ALL\n".join(
        f"SELECT neighbor_id, CAST({t} AS BIGINT) AS tbl, "
        f"{bucket_expr('__cv', planes)} AS bucket FROM c0"
        for t, planes in enumerate(tables)
    )
    q_arms = "\nUNION ALL\n".join(
        f"SELECT query_id, CAST({t} AS BIGINT) AS tbl, "
        f"{bucket_expr('__qv', planes)} AS b0 FROM q0"
        for t, planes in enumerate(tables)
    )
    if multiprobe:
        probes = "[b0" + "".join(
            f", xor(b0, {1 << i})" for i in range(n_planes)
        ) + "]"
    else:
        probes = "[b0]"
    dotexpr = (
        "list_sum(list_transform(list_zip(q0.__qv, c0.__cv), "
        "x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))"
    )

    def norm(alias, col):
        return (
            f"sqrt(list_sum(list_transform({alias}.{col}, "
            f"x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"
        )

    return f"""WITH q0 AS (SELECT {query_id} AS query_id, {vec} AS __qv FROM ({queries})
           WHERE {vec} IS NOT NULL),
c0 AS (SELECT {corpus_id} AS neighbor_id, {vec} AS __cv FROM ({corpus})
       WHERE {vec} IS NOT NULL),
cb AS ({c_arms}),
qb AS ({q_arms}),
qp AS (SELECT query_id, tbl, unnest({probes}) AS bucket FROM qb),
cand AS (
  SELECT DISTINCT qp.query_id, cb.neighbor_id
  FROM qp JOIN cb ON qp.tbl = cb.tbl AND qp.bucket = cb.bucket
  WHERE qp.query_id <> cb.neighbor_id
),
sim AS (
  SELECT cand.query_id, cand.neighbor_id,
         {dotexpr} / ({norm('q0', '__qv')} * {norm('c0', '__cv')}) AS __sim
  FROM cand
  JOIN q0 ON q0.query_id = cand.query_id
  JOIN c0 ON c0.neighbor_id = cand.neighbor_id
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY __sim DESC, neighbor_id ASC) AS rank
  FROM sim
)
SELECT query_id, neighbor_id, __sim AS cosine_sim, CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= {k}"""


#: shared constants of the SIFT/PolyPhen gate row — the Spark query and
#: this oracle derive transcripts/variants/predictions from the SAME
#: formulas over the TPC-H keys, so the two engines must agree bit-for-bit
SIFT_GATE_CDS = "ATGGCTGAAGTTCCACGATTAAGCGGATAA"  # 10 codons: MAEVPRLSG*
SIFT_GATE_AAS = "ACDEFGHIKLMNPQRSTVWY*"


def annotate_sift_sql(
    nation: str = "SELECT * FROM nation",
    supplier: str = "SELECT * FROM supplier",
) -> str:
    """Mirror of the ``annotate_sift`` gate row: synthetic coding
    transcripts (one per nation row, a fixed CDS literal), SNV variants
    derived from supplier keys, and a SIFT/PolyPhen context table derived
    from the SAME keys — one prediction row per variant's
    (transcript, protein_position, alt_aa), scores a pure function of that
    key triple, so coverage is total at every scale factor.  The oracle
    recomputes the amino-acid substitution from the CDS literal via a
    generated 64-branch codon CASE and renders VEP's ``prediction(score)``
    form with spaces collapsed to underscores (reference
    lookup_sift_polyphen, annotate_provider.rs:2111-2176)."""
    from ..functions.consequence import CODON_TABLE

    cds = SIFT_GATE_CDS
    n_codons = len(cds) // 3

    def aa_case(codon_expr: str) -> str:
        whens = "\n    ".join(
            f"WHEN '{c}' THEN '{a}'" for c, a in sorted(CODON_TABLE.items())
        )
        return f"(CASE {codon_expr} {whens} ELSE 'X' END)"

    alt_codon = (
        "concat(substr(ref_codon, 1, codon_off), v.alt, "
        "substr(ref_codon, codon_off + 2))"
    )
    aas = SIFT_GATE_AAS
    return f"""
WITH n AS ({nation}), s AS ({supplier}),
txs AS (
  SELECT concat('TXS', CAST(n_nationkey AS VARCHAR)) AS transcript_id,
         CAST(n_nationkey % 3 + 1 AS VARCHAR) AS chrom,
         CAST(n_nationkey * 10000 + 1000 AS BIGINT) AS tx_start
  FROM n
),
v0 AS (
  SELECT s_suppkey % 25 AS txk,
         CAST(3 + (s_suppkey * 7) % {3 * (n_codons - 2)} AS BIGINT) AS cds_off,
         s_suppkey % 3 AS altk
  FROM s
),
v AS (
  SELECT t.chrom, t.tx_start + v0.cds_off AS start,
         t.tx_start + v0.cds_off AS "end",
         substr('{cds}', CAST(v0.cds_off + 1 AS INT), 1) AS ref,
         substr('ACGT',
                CAST((strpos('ACGT', substr('{cds}', CAST(v0.cds_off + 1 AS INT), 1))
                      + v0.altk) % 4 + 1 AS INT), 1) AS alt,
         t.transcript_id, v0.cds_off
  FROM v0 JOIN txs t ON t.transcript_id = concat('TXS', CAST(v0.txk AS VARCHAR))
),
ann AS (
  SELECT v.chrom, v.start, v."end", v.ref, v.alt,
         v.transcript_id AS feature,
         CAST(v.cds_off // 3 + 1 AS BIGINT) AS protein_position,
         CAST(v.cds_off % 3 AS INT) AS codon_off,
         substr('{cds}', CAST((v.cds_off // 3) * 3 + 1 AS INT), 3) AS ref_codon
  FROM v
),
ann2 AS (
  SELECT *, {aa_case('ref_codon')} AS ref_aa,
         {aa_case(alt_codon)} AS alt_aa
  FROM ann v
),
scored AS (
  SELECT *,
         CASE WHEN ref_aa <> alt_aa THEN
           CAST((strpos('{aas}', alt_aa) * 7 + protein_position) % 19 AS DOUBLE) / 20.0
         END AS sift_score,
         CASE WHEN ref_aa <> alt_aa THEN
           CAST((strpos('{aas}', alt_aa) * 11 + protein_position) % 19 AS DOUBLE) / 20.0
         END AS polyphen_score
  FROM ann2
)
SELECT chrom, start, "end", ref, alt, feature,
       CASE WHEN ref_aa = alt_aa THEN ref_aa
            ELSE concat(ref_aa, '/', alt_aa) END AS amino_acids,
       CAST(protein_position AS VARCHAR) AS protein_position,
       CASE WHEN sift_score IS NOT NULL THEN
         concat(CASE WHEN sift_score < 0.05 THEN 'deleterious' ELSE 'tolerated' END,
                '(', CAST(sift_score AS VARCHAR), ')') END AS sift,
       CASE WHEN polyphen_score IS NOT NULL THEN
         concat(CASE WHEN polyphen_score > 0.9 THEN 'probably_damaging' ELSE 'benign' END,
                '(', CAST(polyphen_score AS VARCHAR), ')') END AS polyphen
FROM scored"""
