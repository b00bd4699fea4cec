#!/usr/bin/env python3
"""Grid 7 (round 11): structural-variant feature context for the SV CSQ
arm — features7.tsv = the grid-3 regulatory/motif/miRNA rows PLUS ``sv``
rows (``sv\\tID\\tstart\\tend\\tkind\\tevent``) placed to exercise every
merge family over the shared 1517-variant ladder:

* transcript-kind ablation + generic truncation overlapping the coding
  heart of the grid (fused into ONE id-less default entry),
* regulatory-kind amplification overlapping RegA (merges INTO the RegA
  entry) and a second one over a regulatory-feature-FREE span (the
  standalone id-less RegulatoryFeature entry),
* tfbs-kind ablation overlapping MotA (merges into the motif entry) and
  one over a motif-free span (a motif entry from SV terms alone).

Usage: python gen_grid7.py [outdir]
"""

from __future__ import annotations

import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
OUT = sys.argv[1] if len(sys.argv) > 1 else HERE

SV_ROWS = [
    # kind, event, span, id
    ("SVTX1", 1090, 1260, "transcript", "ablation"),
    ("SVGEN1", 1150, 1320, "generic", "truncation"),
    ("SVGEN2", 1440, 1470, "generic", "elongation"),
    ("SVREG1", 1060, 1120, "regulatory", "amplification"),   # inside RegA
    ("SVREG2", 1550, 1570, "regulatory", "ablation"),        # reg-free span
    ("SVTFBS1", 1105, 1110, "tfbs", "ablation"),             # inside MotA
    ("SVTFBS2", 1470, 1480, "tfbs", "amplification"),        # motif-free span
]


def main() -> None:
    base = open(os.path.join(HERE, "features3.tsv")).read()
    with open(os.path.join(OUT, "features7.tsv"), "w") as fh:
        fh.write(base)
        for fid, s, e, kind, event in SV_ROWS:
            fh.write(f"sv\t{fid}\t{s}\t{e}\t{kind}\t{event}\n")
    print("wrote features7.tsv")


if __name__ == "__main__":
    main()
