"""V11 golden-benchmark harness: diff `annotate_vep` against the Ensembl
VEP 115 golden output committed in the reference
(`vep-benchmark/data/golden/`, driven by `tests/vcf_roundtrip_golden.rs` and
`golden_benchmark.rs:1-40`).

Like the reference's `vcf_passthrough.rs:19`, the LFS arm SKIPS when the
git-LFS fixtures are not hydrated (the files are then LFS pointer stubs).
On this checkout they are un-hydrated pointers and there is no network to
fetch them.

**Mini-golden arm (round 11, ALWAYS runs)**: the committed-golden gap is
closed by ``test_mini_golden_vcf_end_to_end`` below — a VCF-file-in →
``read_vcf`` → ``annotate_to_vcf`` → VCF-file-out → reparse loop over the
1000 lead variants of the differential grid, diffed byte-equal against
the REFERENCE-ENGINE-produced CSQ strings committed in
``fixtures/refgrid/ref_out4.jsonl.gz`` (see the fixtures README: the
reference's own engine + CSQ writer, compiled standalone).  This
exercises the same end-to-end surface the LFS golden would — VCF parse,
annotation, INFO fold, VCF serialization — against a golden the repo
actually carries.  Engine-rule parity is additionally pinned by
``tests/test_consequence_parity.py`` truth tables.
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


def test_mini_golden_vcf_end_to_end(spark, tmp_path):
    """Committed-golden VCF loop: write the grid's lead 1000 variants as a
    VCF file, run read_vcf → annotate_to_vcf (full grid context + FASTA
    shift) → reparse the emitted VCF, and require the CSQ INFO payload to
    be BYTE-EQUAL to the reference-engine-produced strings pinned in
    ref_out4.jsonl.gz.  This is the golden-benchmark shape
    (vcf_roundtrip_golden.rs) against a golden this repo carries."""
    import gzip
    import json
    import os

    from datafusion_bio_functions_spark.sources.readers import (
        annotate_to_vcf, read_vcf,
    )
    from tests.test_csq_grid_parity import FIX, _load_context

    golden = {}
    with gzip.open(f"{FIX}/ref_out4.jsonl.gz", "rt") as fh:
        for line in fh:
            r = json.loads(line)
            golden[(r["pos"], r["ref"], r["alt"])] = r["csq"]

    # input VCF: first 1000 distinct grid variants, VCF-shaped
    seen, body = set(), []
    for line in open(f"{FIX}/variants.tsv"):
        f = line.rstrip("\n").split("\t")
        key = (int(f[1]), f[3], f[4])
        if key in seen:
            continue
        seen.add(key)
        body.append(f"1\t{f[1]}\t.\t{f[3]}\t{f[4]}\t.\t.\t.")
        if len(body) == 1000:
            break
    inp = tmp_path / "mini_input.vcf"
    inp.write_text(
        "##fileformat=VCFv4.2\n#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n"
        + "\n".join(body) + "\n"
    )

    vcf = read_vcf(spark, str(inp))
    tx, ex, tl, reg, mot, mirf = _load_context(spark)
    cache = spark.createDataFrame(
        [],
        "chrom string, start long, end long, variation_name string, "
        "allele_string string",
    )
    outdir = tmp_path / "annotated"
    n = annotate_to_vcf(
        vcf, cache, str(outdir),
        transcripts=tx, exons=ex, regulatory=reg, motifs=mot, mirnas=mirf,
        translations=tl, vep_options={},
        reference_genome={"1": open(f"{FIX}/genome.txt").read().strip()},
    )
    assert n == 1000

    got = {}
    for part in sorted(os.listdir(outdir)):
        if part.startswith(("00_header", ".", "_")) or part.endswith(".crc"):
            continue
        for line in (outdir / part).read_text().splitlines():
            if not line.strip() or line.startswith("#"):
                continue
            f = line.split("\t")
            csq = ""
            for kv in f[7].split(";"):
                if kv.startswith("CSQ="):
                    csq = kv[4:]
            got[(int(f[1]), f[3], f[4])] = csq

    assert len(got) == 1000
    diverged = {
        k: {"golden": golden[k], "got": got[k]}
        for k in got
        if golden.get(k) != got[k]
    }
    assert not diverged, (
        f"{len(diverged)} variants diverged from the committed mini-golden: "
        f"{dict(list(diverged.items())[:3])}"
    )
