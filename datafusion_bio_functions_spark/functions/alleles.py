"""VEP allele matching / normalization scalar functions.

Pure-Python ports of the reference's 5 scalar UDFs plus the underlying
Ensembl ``trim_sequences`` logic (reference
``datafusion/bio-function-vep/src/allele.rs``):

* ``vep_allele(ref, alt)``            — allele.rs:647-693 (string "R/A")
* ``match_allele(ref, alt, astr)``    — allele.rs:391-423
* ``match_allele_relaxed(...)``       — allele.rs:466-505
* ``vep_norm_start(pos, ref, alt)``   — allele.rs:751-755
* ``vep_norm_end(pos, ref, alt)``     — allele.rs:765-768
* ``trim_sequences_ensembl``          — allele.rs:32-189 (Ensembl Variation
  ``trim_sequences()`` release/115 semantics)

All are registered on the SparkSession as Arrow-batched pandas UDFs by
``register_allele_udfs`` so they are callable from ``spark.sql`` exactly like
the reference's SQL surface, and usable as Columns via the module-level
wrappers.  They run per-row string logic — the slow path by design; the hot
joins around them stay JVM-side.
"""

from __future__ import annotations

import sys

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import BooleanType, LongType, StringType

# Spark's python workers don't inherit the driver's sys.path; serialize this
# module's functions by value so the UDFs run wherever the package isn't
# importable (e.g. a driver launched from another cwd, or real executors
# without the package shipped).
try:
    from pyspark import cloudpickle as _cp

    _cp.register_pickle_by_value(sys.modules[__name__])
except Exception:  # pragma: no cover - best effort
    pass


# ---------------------------------------------------------------------------
# core library (plain Python, reused by the VEP operators)
# ---------------------------------------------------------------------------


def trim_sequences_ensembl(
    ref_allele: str,
    alt_allele: str,
    start: int,
    end: int | None = None,
    end_first: bool = False,
    strand: int = 1,
) -> tuple[str, str, int, int, bool]:
    """Ensembl Variation ``trim_sequences()`` (allele.rs:32-130): trim shared
    prefix/suffix (order per ``end_first``), shifting start/end by strand;
    empty alleles become ``-``."""
    if end is None:
        end = start + len(ref_allele) - 1
    r, a = list(ref_allele), list(alt_allele)
    changed = False

    def trim_suffix():
        nonlocal start, end, changed
        while r and a and r[-1] == a[-1]:
            r.pop()
            a.pop()
            if strand == -1:
                start += 1
            else:
                end -= 1
            changed = True

    def trim_prefix():
        nonlocal start, end, changed
        while r and a and r[0] == a[0]:
            r.pop(0)
            a.pop(0)
            if strand == -1:
                end -= 1
            else:
                start += 1
            changed = True

    if end_first:
        trim_suffix()
        trim_prefix()
    else:
        trim_prefix()
        trim_suffix()
    return ("".join(r) or "-", "".join(a) or "-", start, end, changed)


def parse_variant_allele_string(allele_string: str) -> tuple[str, list[str]] | None:
    """``REF/ALT[/ALT...]`` → (ref, alts) (reference
    parse_variant_allele_string, allele.rs:157-168)."""
    if allele_string.startswith("/") or "/" not in allele_string:
        return None
    ref_allele, *alts = allele_string.split("/")
    if not alts:
        return None
    return ref_allele, alts


def _trim_directions(ref_allele: str, alt_allele: str) -> tuple[bool, ...]:
    """Ensembl checks both left-first and right-first trim order for
    non-SNV alleles, a single pass for SNVs (allele.rs:176-182)."""
    if len(ref_allele) > 1 or len(alt_allele) > 1:
        return (False, True)
    return (False,)


def get_matched_variant_alleles(
    a_allele_string: str, a_pos: int,
    b_allele_string: str, b_pos: int,
    a_strand: int = 1, b_strand: int = 1,
) -> list[tuple[str, int, str, int]]:
    """Ensembl ``get_matched_variant_alleles()`` (reference allele.rs:190-262
    / Utils::Sequence.pm L1098-1258): minimize every alt of both variants
    with ``trim_sequences`` in both trim orders and match on the
    ``(trimmed_ref, trimmed_alt, trimmed_pos)`` key — so a point variant
    matches inside an MNV window and a repeat-shifted deletion matches its
    anchored twin.  Returns ``(a_allele, a_index, b_allele, b_index)``
    tuples."""
    pa = parse_variant_allele_string(a_allele_string)
    pb = parse_variant_allele_string(b_allele_string)
    if pa is None or pb is None or a_pos == 0 or b_pos == 0:
        return []
    a_ref_raw, a_alts_raw = pa
    b_ref_raw, b_alts_raw = pb
    a_ref = a_ref_raw
    flip = a_strand != b_strand
    if flip:
        a_ref = _revcomp_or_none(a_ref)
        if a_ref is None:
            return []
    minimised: list[tuple[str, str, int]] = []  # (key, orig_a_alt, a_index)
    for a_index, orig_a_alt in enumerate(a_alts_raw):
        a_alt = orig_a_alt
        if flip:
            a_alt = _revcomp_or_none(a_alt)
            if a_alt is None:
                return []
        for end_first in _trim_directions(a_ref, orig_a_alt):
            tr, ta, tp, _, _ = trim_sequences_ensembl(
                a_ref, a_alt, a_pos, None, end_first, 1
            )
            minimised.append((f"{tr}_{ta}_{tp}", orig_a_alt, a_index))
    matches: list[tuple[str, int, str, int]] = []
    seen: set[tuple[str, int, str, int]] = set()
    for b_index, orig_b_alt in enumerate(b_alts_raw):
        for end_first in _trim_directions(b_ref_raw, orig_b_alt):
            tr, ta, tp, _, _ = trim_sequences_ensembl(
                b_ref_raw, orig_b_alt, b_pos, None, end_first, 1
            )
            key = f"{tr}_{ta}_{tp}"
            hit = next((m for m in minimised if m[0] == key), None)
            if hit is not None:
                matched = (hit[1], hit[2], orig_b_alt, b_index)
                if matched not in seen:
                    seen.add(matched)
                    matches.append(matched)
                break
    return matches


_COMP = str.maketrans("ACGTNacgtn", "TGCANtgcan")


def _revcomp_or_none(seq: str) -> str | None:
    if seq == "-":
        return "-"
    if any(ch not in "ACGTNacgtn" for ch in seq):
        return None
    return seq.translate(_COMP)[::-1]


def match_alleles_ensembl(
    vcf_ref: str, vcf_alt: str, pos: int,
    allele_string: str, existing_pos: int,
) -> bool:
    """Coordinate-aware existing-variant match: the raw VCF pair (multi-alt
    ``,``/``|`` accepted) against a cache allele string at its own start —
    Ensembl VEP ``compare_existing()`` via get_matched_variant_alleles
    (reference compare_existing_variant, variant_lookup_exec.rs:429-500;
    pinned by compare_existing_variant_matches_point_existing_variant_
    within_mnv)."""
    if not vcf_ref or not vcf_alt or not allele_string:
        return False
    alts = "/".join(a for a in vcf_alt.replace("|", ",").split(",") if a)
    if not alts:
        return False
    return bool(
        get_matched_variant_alleles(
            f"{vcf_ref}/{alts}", pos, allele_string, existing_pos
        )
    )


def _vep_prefix_suffix_len(ref_allele: str, alt_allele: str) -> tuple[int, int]:
    """allele.rs:700-738: SNVs are untouched; common prefix always trimmed;
    suffix trimmed only for indels (length-changing), never MNVs."""
    if len(ref_allele) == 1 and len(alt_allele) == 1:
        return 0, 0
    prefix = 0
    for x, y in zip(ref_allele, alt_allele):
        if x != y:
            break
        prefix += 1
    suffix = 0
    if len(ref_allele) != len(alt_allele):
        ref_rem = len(ref_allele) - prefix
        alt_rem = len(alt_allele) - prefix
        while (
            suffix < ref_rem
            and suffix < alt_rem
            and ref_allele[len(ref_allele) - 1 - suffix] == alt_allele[len(alt_allele) - 1 - suffix]
        ):
            suffix += 1
    return prefix, suffix


def vcf_to_vep_allele(ref_allele: str, alt_allele: str) -> tuple[str, str]:
    """allele.rs:283-329: VCF REF/ALT → VEP allele pair ('-' for empty)."""
    p, s = _vep_prefix_suffix_len(ref_allele, alt_allele)
    vr = ref_allele[p : len(ref_allele) - s]
    va = alt_allele[p : len(alt_allele) - s]
    return (vr or "-", va or "-")


def vcf_to_vep_input_allele(pos: int, ref_allele: str, alt_allele: str) -> tuple[str, str, int]:
    """allele.rs:343-369: parser-level normalization — indels lose only one
    shared leading anchor base; start bumps when that happens."""
    is_indel = len(ref_allele) != 1 or len(alt_allele) != 1
    if is_indel and ref_allele and alt_allele and ref_allele[0] == alt_allele[0]:
        return (ref_allele[1:] or "-", alt_allele[1:] or "-", pos + 1)
    return (ref_allele, alt_allele, pos)


def _trim_right_first(ref_allele: str, alt_allele: str) -> tuple[str, str]:
    """allele.rs:425-455: suffix trim then prefix trim."""
    r, a = list(ref_allele), list(alt_allele)
    while r and a and r[-1] == a[-1]:
        r.pop()
        a.pop()
    while r and a and r[0] == a[0]:
        r.pop(0)
        a.pop(0)
    return ("".join(r) or "-", "".join(a) or "-")


def allele_matches(vcf_ref: str, vcf_alt: str, allele_string: str) -> bool:
    """allele.rs:391-423: VCF REF/ALT vs VEP 'REF/ALT1/ALT2...' string;
    multi-alt VCF strings use '|' or ',' separators; bidirectional trim."""
    parts = allele_string.split("/")
    if not parts:
        return False
    cache_ref, cache_alts = parts[0], parts[1:]
    for alt in (a for a in vcf_alt.replace("|", ",").split(",") if a):
        vep_ref, vep_alt = vcf_to_vep_allele(vcf_ref, alt)
        if (cache_ref == vep_ref or cache_ref == vcf_ref) and vep_alt in cache_alts:
            return True
        for cache_alt in cache_alts:
            if _trim_right_first(cache_ref, cache_alt) == (vep_ref, vep_alt):
                return True
    return False


def _canonical_event_lengths(ref_allele: str, alt_allele: str) -> tuple[int, int]:
    """allele.rs:516-546: lengths after shared prefix+suffix trimming."""
    r = "" if ref_allele == "-" else ref_allele
    a = "" if alt_allele == "-" else alt_allele
    rs = 0
    while rs < len(r) and rs < len(a) and r[rs] == a[rs]:
        rs += 1
    re_, ae = len(r), len(a)
    while re_ > rs and ae > rs and r[re_ - 1] == a[ae - 1]:
        re_ -= 1
        ae -= 1
    return re_ - rs, ae - rs


def allele_matches_relaxed(vcf_ref: str, vcf_alt: str, allele_string: str) -> bool:
    """allele.rs:466-505: strict match, else indel class+length match."""
    if allele_matches(vcf_ref, vcf_alt, allele_string):
        return True
    parts = allele_string.split("/")
    if not parts:
        return False
    cache_ref = parts[0]
    cache_alts = [a for a in parts[1:] if a]
    if not cache_alts:
        return False
    for alt in (a for a in vcf_alt.replace("|", ",").split(",") if a):
        vr, va = _canonical_event_lengths(vcf_ref, alt)
        v_ins = vr == 0 and va > 0
        v_del = vr > 0 and va == 0
        if not (v_ins or v_del):
            continue
        for cache_alt in cache_alts:
            cr, ca = _canonical_event_lengths(cache_ref, cache_alt)
            if v_ins and cr == 0 and ca > 0 and va == ca:
                return True
            if v_del and cr > 0 and ca == 0 and vr == cr:
                return True
    return False


def vep_norm_start(pos: int, ref_allele: str, alt_allele: str) -> int:
    """allele.rs:751-755: ``vcf_pos + prefix_len``."""
    p, _ = _vep_prefix_suffix_len(ref_allele, alt_allele)
    return pos + p


def vep_norm_end(pos: int, ref_allele: str, alt_allele: str) -> int:
    """allele.rs:765-768: ``vcf_pos + len(REF) - 1 - suffix_len``
    (insertions yield start > end — the VEP convention)."""
    _, s = _vep_prefix_suffix_len(ref_allele, alt_allele)
    return pos + len(ref_allele) - 1 - s


def vep_allele_string(ref_allele: str, alt_allele: str) -> str:
    """allele.rs:640-693: VEP-format 'ref/alt' string."""
    vr, va = vcf_to_vep_allele(ref_allele, alt_allele)
    return f"{vr}/{va}"


# ---------------------------------------------------------------------------
# Spark UDF surface
# ---------------------------------------------------------------------------


def _nullsafe(fn, *series, default=None):
    def apply(row):
        if any(v is None or (isinstance(v, float) and pd.isna(v)) for v in row):
            return default
        return fn(*row)

    return pd.Series([apply(row) for row in zip(*series)])


@pandas_udf(BooleanType())
def match_allele_udf(r: pd.Series, a: pd.Series, s: pd.Series) -> pd.Series:
    return _nullsafe(allele_matches, r, a, s)


@pandas_udf(BooleanType())
def match_allele_relaxed_udf(r: pd.Series, a: pd.Series, s: pd.Series) -> pd.Series:
    return _nullsafe(allele_matches_relaxed, r, a, s)


@pandas_udf(BooleanType())
def match_alleles_ensembl_udf(
    r: pd.Series, a: pd.Series, p: pd.Series, s: pd.Series, cp: pd.Series
) -> pd.Series:
    return _nullsafe(match_alleles_ensembl, r, a, p, s, cp)


@pandas_udf(StringType())
def vep_allele_udf(r: pd.Series, a: pd.Series) -> pd.Series:
    return _nullsafe(vep_allele_string, r, a)


@pandas_udf(LongType())
def vep_norm_start_udf(p: pd.Series, r: pd.Series, a: pd.Series) -> pd.Series:
    return _nullsafe(vep_norm_start, p, r, a)


@pandas_udf(LongType())
def vep_norm_end_udf(p: pd.Series, r: pd.Series, a: pd.Series) -> pd.Series:
    return _nullsafe(vep_norm_end, p, r, a)


def register_allele_udfs(spark: SparkSession) -> None:
    """SQL registration mirroring ``register_vep_functions``."""
    spark.udf.register("match_allele", match_allele_udf)
    spark.udf.register("match_allele_relaxed", match_allele_relaxed_udf)
    spark.udf.register("vep_allele", vep_allele_udf)
    spark.udf.register("vep_norm_start", vep_norm_start_udf)
    spark.udf.register("vep_norm_end", vep_norm_end_udf)
