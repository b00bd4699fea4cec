#!/usr/bin/env python3
"""Grid 5 (round 11): deterministic transcript METADATA + SIFT/PolyPhen
prediction matrices + protein domain features for the ``--everything``
CSQ-string differential arm.

Reads transcripts.tsv + transcripts3.tsv (the combined grid1+grid3
context) and writes three TSVs consumed by BOTH the standalone reference
replay (refdbg dump5) and the Spark-side test — neither side re-derives
any of this, so the files are the single source of truth:

* ``meta5.tsv``   — per-transcript Batch-1 metadata (CANONICAL, TSL,
  MANE_SELECT/MANE_PLUS_CLINICAL, APPRIS, CCDS, SWISSPROT/TREMBL/UNIPARC/
  UNIPROT_ISOFORM, GENE_PHENO, and an ncRNA dot-bracket structure for the
  miRNA transcripts).  Values cycle deterministically by sorted-id index;
  SWISSPROT/TREMBL deliberately carry spaces/semicolons to exercise
  csq_escape, APPRIS carries principal/alternative forms to exercise
  format_appris.
* ``sift5.tsv``   — (transcript_id, protein_position, alt_aa,
  sift_prediction_idx, sift_score, polyphen_prediction_idx,
  polyphen_score) for every coding transcript; ~1/3 of (pos, aa) cells
  are deliberately ABSENT so lookup misses are exercised.  Scores are
  3-decimal in (0, 1) exclusive — identical shortest-repr rendering from
  Rust f32 and Spark double.
* ``domains5.tsv`` — (transcript_id, start, end, analysis, hseqname)
  protein features; some rows analysis-only, some hseqname-only, labels
  with spaces/semicolons/equals to exercise the label escaping.

Usage: python gen_grid5.py [outdir]   (default: this directory)
"""

from __future__ import annotations

import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
OUT = sys.argv[1] if len(sys.argv) > 1 else HERE

AAS = "ACDEFGHIKLMNPQRSTVWY"
SIFT_PREDS = {
    0: "tolerated", 1: "deleterious",
    2: "tolerated - low confidence", 3: "deleterious - low confidence",
}
POLY_PREDS = {4: "benign", 5: "possibly damaging", 6: "probably damaging", 7: "unknown"}


def _load_tx():
    rows = []
    for fname in ("transcripts.tsv", "transcripts3.tsv"):
        for line in open(os.path.join(HERE, fname)):
            f = line.rstrip("\n").split("\t")
            rows.append((f[0], f[5], f[13] if len(f) > 13 else ""))
    return sorted(rows)


def main() -> None:
    txs = _load_tx()

    with open(os.path.join(OUT, "meta5.tsv"), "w") as fh:
        for i, (tid, biotype, _prot) in enumerate(txs):
            canonical = "1" if i % 2 == 0 else ""
            tsl = str(i % 5 + 1) if i % 3 else ""
            mane_sel = f"NM_{1000 + i}.{i % 4 + 1}" if i % 3 == 0 else ""
            mane_plus = f"NM_{2000 + i}.1" if i % 7 == 3 else ""
            appris = ["principal1", "principal3", "alternative1", "alternative2", ""][i % 5]
            ccds = f"CCDS{100 + i}.1" if i % 2 else ""
            swissprot = f"SP {i};V1" if i % 4 == 0 else (f"SP_{i}" if i % 4 == 1 else "")
            trembl = f"TR{i} B" if i % 3 == 1 else ""
            uniparc = f"UPI0000{i:04d}" if i % 2 == 0 else ""
            uniprot_iso = f"P{i:05d}-2" if i % 5 == 2 else ""
            gene_pheno = "1" if i % 4 == 2 else ""
            # dot-bracket with RLE + start:end prefix for the miRNA arms
            ncrna = f"1:60 (8.3)8(4.6)4.{9 + i}" if biotype == "miRNA" else ""
            fh.write(
                "\t".join(
                    [tid, canonical, tsl, mane_sel, mane_plus, appris, ccds,
                     swissprot, trembl, uniparc, uniprot_iso, gene_pheno, ncrna]
                )
                + "\n"
            )

    with open(os.path.join(OUT, "sift5.tsv"), "w") as fh:
        for tid, _bt, prot in txs:
            if not prot:
                continue
            for pos in range(1, len(prot) + 1):
                for aa in AAS:
                    if (pos * 7 + ord(aa)) % 3 == 0:
                        continue  # deliberate lookup miss
                    s_sc = ((pos * 31 + ord(aa) * 7) % 999 + 1) / 1000
                    p_sc = ((pos * 13 + ord(aa) * 17) % 999 + 1) / 1000
                    s_pred = 1 if s_sc < 0.05 else 0
                    if (pos + ord(aa)) % 11 == 0:
                        s_pred += 2  # low-confidence twin
                    if p_sc <= 0.446:
                        p_pred = 4
                    elif p_sc <= 0.908:
                        p_pred = 5
                    else:
                        p_pred = 6
                    if (pos * ord(aa)) % 13 == 0:
                        p_pred = 7
                    fh.write(
                        f"{tid}\t{pos}\t{aa}\t{s_pred}\t{s_sc:g}\t{p_pred}\t{p_sc:g}\n"
                    )

    with open(os.path.join(OUT, "domains5.tsv"), "w") as fh:
        for i, (tid, _bt, prot) in enumerate(txs):
            if not prot:
                continue
            L = len(prot)
            fh.write(f"{tid}\t1\t{max(1, L // 3)}\tPfam\tPF{100 + i:05d}\n")
            fh.write(f"{tid}\t{max(1, L // 4)}\t{max(1, L // 2)}\tPROSITE patterns\tPS=00{i}\n")
            if i % 2 == 0:
                fh.write(f"{tid}\t{max(1, L // 2)}\t{L}\t\tSSF;{2000 + i}\n")
            if i % 3 == 0:
                fh.write(f"{tid}\t{max(1, L - 5)}\t{L}\tSuperfamily domains\t\n")
    print("wrote meta5.tsv sift5.tsv domains5.tsv to", OUT)


if __name__ == "__main__":
    main()
