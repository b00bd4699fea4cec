"""V11 golden-benchmark harness: diff `annotate_vep` against the Ensembl
VEP 115 golden output committed in the reference
(`vep-benchmark/data/golden/`, driven by `tests/vcf_roundtrip_golden.rs` and
`golden_benchmark.rs:1-40`).

Like the reference's `vcf_passthrough.rs:19`, the harness SKIPS when the
git-LFS fixtures are not hydrated (the files are then LFS pointer stubs).
On this checkout they are un-hydrated pointers and there is no network to
fetch them, so engine parity is instead pinned by
``tests/test_consequence_parity.py`` — truth tables derived from the
reference's own VEP-115-verified in-module engine tests
(`transcript_consequence.rs` test module), which cover the same rule
surface the golden diff would exercise.
"""

from __future__ import annotations

from pathlib import Path

import pytest

GOLDEN = Path("/root/reference/vep-benchmark/data/golden")


def _hydrated(p: Path) -> bool:
    if not p.exists():
        return False
    head = p.read_bytes()[:60]
    return not head.startswith(b"version https://git-lfs.github.com")


needs_golden = pytest.mark.skipif(
    not _hydrated(GOLDEN / "input_1000.vcf"),
    reason="reference golden fixtures are git-LFS pointers (not hydrated)",
)


def _parse_vcf(path: Path) -> list[tuple]:
    rows = []
    for line in path.read_text().splitlines():
        if line.startswith("#") or not line.strip():
            continue
        f = line.split("\t")
        info = f[7] if len(f) > 7 else ""
        csq = ""
        for kv in info.split(";"):
            if kv.startswith("CSQ="):
                csq = kv[4:]
        rows.append((f[0], int(f[1]), f[3], f[4], csq))
    return rows


@needs_golden
def test_annotate_vep_vs_golden(spark):
    """Run annotate_vep on the golden 1000-variant input with the chr1 cache
    slice and compare most_severe_consequence per variant against the
    VEP-115 golden CSQ (first consequence term of the first entry)."""
    from datafusion_bio_functions_spark.operators.vep import annotate_vep

    variants = _parse_vcf(GOLDEN / "input_1000.vcf")
    vcf = spark.createDataFrame(
        [(c, p, p, r, a) for c, p, r, a, _ in variants],
        "chrom string, start long, end long, ref string, alt string",
    )
    cache = spark.read.parquet(str(GOLDEN / "cache" / "variation" / "chr1.parquet"))
    out = annotate_vep(vcf, cache)
    got = {(r.chrom, r.start): r.most_severe_consequence for r in out.collect()}
    golden = {
        (c, p): csq.split("|")[1].split("&")[0]
        for c, p, _, _, csq in variants
        if csq
    }
    compared = [k for k in golden if k in got]
    assert len(compared) > 0
    mismatches = [(k, got[k], golden[k]) for k in compared if got[k] != golden[k]]
    # parity target = the committed golden outputs (README.md:92-94 notes
    # codon-accurate parity is in-progress upstream too); report rate
    assert len(mismatches) / len(compared) < 0.15, mismatches[:20]


def test_golden_gate_reports_skip_reason():
    """The gate itself must be accurate: on this checkout the fixtures are
    LFS pointers, so the harness reports exactly why it skipped."""
    hydrated = _hydrated(GOLDEN / "input_1000.vcf")
    exists = (GOLDEN / "input_1000.vcf").exists()
    assert exists, "reference golden directory missing entirely"
    if not hydrated:
        pytest.skip("golden fixtures present but not hydrated (LFS pointers) — harness armed")
