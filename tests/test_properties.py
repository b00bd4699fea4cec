"""Property-based interval-algebra invariants (hypothesis).

The reference ships no property/randomized testing (SURVEY.md §5.1); these
laws tie the operator family together so a bug in any one implementation
breaks a cross-operator identity, not just a hand-picked fixture:

* merge is idempotent;
* cluster partitions the input: cluster count == merge row count and
  per-cluster sizes == merge ``n_intervals``;
* per-row conservation: |subtract(l, r)| + |l ∩ merge(r)| == |l| in base
  pairs (subtract and coverage agree);
* complement ∪ merge tiles the per-contig span exactly.

Example counts are small — each example runs real Spark jobs.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

import datafusion_bio_functions_spark as bio
from pyspark.sql import functions as F

pytestmark = pytest.mark.usefixtures("spark")

interval = st.tuples(
    st.sampled_from(["chrA", "chrB"]),
    st.integers(min_value=1, max_value=2_000),
    st.integers(min_value=0, max_value=150),
)
interval_lists = st.lists(interval, min_size=1, max_size=40)

SETTINGS = settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _df(spark, rows):
    return spark.createDataFrame(
        [(c, s, s + ln) for c, s, ln in rows],
        "contig string, pos_start long, pos_end long",
    )


@given(rows=interval_lists)
@SETTINGS
def test_merge_idempotent(spark, rows):
    m1 = bio.merge(_df(spark, rows))
    m2 = bio.merge(m1.select("contig", "pos_start", "pos_end"))
    a = sorted((r.contig, r.pos_start, r.pos_end) for r in m1.collect())
    b = sorted((r.contig, r.pos_start, r.pos_end) for r in m2.collect())
    assert a == b


@given(rows=interval_lists)
@SETTINGS
def test_cluster_partitions_input(spark, rows):
    df = _df(spark, rows)
    cl = bio.cluster(df).collect()
    m = bio.merge(df).collect()
    # every row assigned exactly once
    assert len(cl) == len(rows)
    # cluster extents == merge extents, sizes == n_intervals
    sizes: dict[int, int] = {}
    extents = {}
    for r in cl:
        sizes[r.cluster] = sizes.get(r.cluster, 0) + 1
        extents[r.cluster] = (r.contig, r.cluster_start, r.cluster_end)
    assert sorted(extents.values()) == sorted((r.contig, r.pos_start, r.pos_end) for r in m)
    merge_sizes = sorted(r.n_intervals for r in m)
    assert sorted(sizes.values()) == merge_sizes


@given(lrows=interval_lists, rrows=interval_lists)
@SETTINGS
def test_subtract_matches_python_sweep(spark, lrows, rrows):
    """subtract == an in-Python port of the reference's end-exclusive
    fragment sweep (subtract.rs:414-438): cursor starts at ls, each
    overlapping merged right (rs, re) emits (cursor, rs) when rs > cursor
    and advances cursor to max(cursor, re); tail (cursor, le) when
    cursor < le.  Exact row-for-row comparison, both filter ops."""
    l, r = _df(spark, lrows), _df(spark, rrows)

    def merged(rows, op):
        out = []
        for c in sorted({x[0] for x in rows}):
            ivs = sorted((s, s + ln) for cc, s, ln in rows if cc == c)
            cur = None
            for s, e in ivs:
                if cur is None:
                    cur = [s, e]
                elif (s <= cur[1]) if op == "weak" else (s < cur[1]):
                    cur[1] = max(cur[1], e)
                else:
                    out.append((c, cur[0], cur[1]))
                    cur = [s, e]
            if cur is not None:
                out.append((c, cur[0], cur[1]))
        return out

    for op in ("weak", "strict"):
        want = []
        mr = merged(rrows, op)
        for c, ls, ln in lrows:
            le = ls + ln
            rights = [
                (rs, re)
                for rc, rs, re in mr
                if rc == c
                and ((ls <= re and le >= rs) if op == "weak" else (ls < re and le > rs))
            ]
            cursor = ls
            for rs, re in sorted(rights):
                if rs > cursor:
                    want.append((c, cursor, rs))
                cursor = max(cursor, re)
            if cursor < le:
                want.append((c, cursor, le))
        got = sorted(
            map(tuple, bio.subtract(l, r, filter_op=op).collect())
        )
        assert got == sorted(want), op


@given(rows=interval_lists)
@SETTINGS
def test_complement_tiles_span(spark, rows):
    """complement ∪ merge tiles each contig's [min_start, max_end] with no
    overlap and no gap.  Complement gaps are END-EXCLUSIVE (a gap's end
    equals the next covered start, reference
    test_complement_udtf_basic_no_view), so adjacent pieces SHARE their
    boundary coordinate: walking the sorted pieces, each must start at the
    previous piece's end."""
    df = _df(spark, rows)
    m = [(r.contig, r.pos_start, r.pos_end) for r in bio.merge(df).collect()]
    comp = [
        (r.contig, r.pos_start, r.pos_end)
        for r in bio.complement(df).collect()
        # default view is (0, i64::MAX): ignore the leading/trailing rays
        if r.pos_start > 0 and r.pos_end < 4_000_000_000
    ]
    for contig in {c for c, _, _ in m}:
        pieces = sorted(
            [(s, e) for c, s, e in m if c == contig]
            + [(s, e) for c, s, e in comp if c == contig]
        )
        hi = max(e for _, e in pieces)
        pos = min(s for s, _ in pieces)
        for s, e in pieces:
            assert s == pos, (contig, pieces)
            pos = e
        assert pos == hi


cigar_run = st.tuples(
    st.integers(min_value=1, max_value=30),
    st.sampled_from("MIDNS=X"),
)


@st.composite
def cigars(draw):
    runs = draw(st.lists(cigar_run, min_size=1, max_size=5))
    # S only legal at the ends; keep it simple: move any S runs to the edges
    body = [(n, op) for n, op in runs if op != "S"]
    if not body:
        body = [(draw(st.integers(min_value=1, max_value=30)), "M")]
    return "".join(f"{n}{op}" for n, op in body)


@given(reads=st.lists(st.tuples(st.integers(min_value=1, max_value=5_000), cigars()),
                      min_size=1, max_size=15))
@SETTINGS
def test_depth_conserves_cigar_ref_span(spark, reads):
    """Total covered base-pairs (Σ block length × coverage) equals the sum of
    each read's reference-consuming aligned length (M/=/X runs) — D/N gaps
    consume reference silently, I/S never touch it (events.rs semantics)."""
    import re as _re

    from datafusion_bio_functions_spark.operators.pileup import depth

    df = spark.createDataFrame(
        [("chr1", s, 0, c, 60) for s, c in reads],
        "chrom string, start long, flags int, cigar string, mapping_quality int",
    )
    out = depth(df).collect()
    covered = sum((r.pos_end - r.pos_start + 1) * r.coverage for r in out)
    expected = sum(
        sum(int(n) for n, op in _re.findall(r"(\d+)([MIDNSHP=X])", c) if op in "M=X")
        for _, c in reads
    )
    assert covered == expected
    # block invariants: positive coverage, non-empty, sorted disjoint runs
    by_start = sorted((r.pos_start, r.pos_end, r.coverage) for r in out)
    for (s1, e1, c1), (s2, e2, c2) in zip(by_start, by_start[1:]):
        assert e1 < s2 and s1 <= e1
        if e1 + 1 == s2:  # adjacent runs must differ in coverage (maximal RLE)
            assert c1 != c2


# ---------------------------------------------------------------------------
# connected components vs a pure-python union-find reference
# ---------------------------------------------------------------------------


@SETTINGS
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 40), st.integers(0, 40)).filter(lambda e: e[0] != e[1]),
        min_size=1,
        max_size=60,
    )
)
def test_connected_components_matches_union_find(spark, edges):
    from datafusion_bio_functions_spark.operators.dedup import connected_components

    parent: dict[int, int] = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        parent[find(a)] = find(b)
    expected: dict[int, int] = {}
    roots: dict[int, int] = {}
    for node in sorted(parent):
        r = find(node)
        roots.setdefault(r, node)  # min id labels the component
        expected[node] = roots[r]

    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {r.id: r.component for r in connected_components(pairs).collect()}
    assert got == expected


@SETTINGS
@given(
    tokens=st.lists(st.integers(0, 40), min_size=1, max_size=40),
    budget=st.integers(5, 30),
)
def test_pack_documents_matches_sequential_next_fit(spark, tokens, budget):
    from datafusion_bio_functions_spark.operators.packing import pack_documents

    docs = spark.createDataFrame(
        [(i, " ".join("x" for _ in range(t)) if t else "") for i, t in enumerate(tokens)],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.pack_id for r in pack_documents(docs, budget, n_shards=1).collect()}
    acc, pid, expected = 0, -1, {}
    for i, t in enumerate(tokens):
        if pid < 0 or acc + t > budget:
            pid, acc = pid + 1, t
        else:
            acc += t
        expected[i] = pid
    assert out == expected


@SETTINGS
@given(
    pos=st.integers(1, 1000),
    ref=st.text(alphabet="ACGT", min_size=0, max_size=6),
    alt=st.text(alphabet="ACGT", min_size=0, max_size=6),
)
def test_normalize_variant_consistent_with_vep_norm_udf_family(spark, pos, ref, alt):
    # the consequence engine's variant normalization must agree with the
    # allele-library UDF coordinates used by lookup_variants' join keys
    from datafusion_bio_functions_spark.functions.alleles import (
        vep_norm_end,
        vep_norm_start,
    )
    from datafusion_bio_functions_spark.functions.consequence import normalize_variant

    if ref == alt:
        return  # not a variant; UDF family is unspecified here
    vs, ve, r, a, is_ins = normalize_variant(pos, ref, alt)
    assert vs == vep_norm_start(pos, ref, alt)
    if is_ins:
        # insertion: engine uses the from_vcf point (start == end == P);
        # the join-key encoding is start > end (P, P-1)
        assert ve == vs and vep_norm_end(pos, ref, alt) == vs - 1
        assert r == ""
    else:
        assert ve == vep_norm_end(pos, ref, alt)


_texts = st.lists(
    st.one_of(
        st.none(),
        st.text(alphabet=" abcz", min_size=0, max_size=40),
    ),
    min_size=1,
    max_size=12,
)


@given(texts=_texts)
@SETTINGS
def test_repetition_stats_matches_python_counter(spark, texts):
    """repetition_stats == a direct Counter-based per-doc computation, and
    repetition_filter keeps exactly the under-threshold + signal-free docs."""
    from collections import Counter

    from datafusion_bio_functions_spark.functions.text import (
        repetition_filter,
        repetition_stats,
    )

    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {r.doc_id: r for r in repetition_stats(docs).collect()}
    assert set(got) == set(range(len(texts)))
    keep_want = set()
    for i, t in enumerate(texts):
        words = (t or "").strip().lower().split() if t and t.strip() else []
        grams = [" ".join(words[j : j + 2]) for j in range(len(words) - 1)]
        r = got[i]
        if len(words) < 2:
            assert (r.n_ngrams, r.top_ngram_count) == (0, 0)
            assert r.top_ngram_frac is None and r.dup_ngram_frac is None
            keep_want.add(i)
            continue
        c = Counter(grams)
        total, top = len(grams), max(c.values())
        dup = sum(v for v in c.values() if v > 1)
        assert (r.n_ngrams, r.top_ngram_count) == (total, top)
        assert abs(r.top_ngram_frac - top / total) < 1e-12
        assert abs(r.dup_ngram_frac - dup / total) < 1e-12
        if top / total <= 0.2 and dup / total <= 0.6:
            keep_want.add(i)
    kept = {r.doc_id for r in repetition_filter(docs).collect()}
    assert kept == keep_want
