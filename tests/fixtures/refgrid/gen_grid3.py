"""Generate the round-10 differential-grid extension (grid 3): biotype /
splice-edge / feature arms the round-9 grids did not cover —

* NMD / polymorphic_pseudogene biotypes (NMD_transcript_variant, coding
  terms on polymorphic pseudogenes),
* miRNA transcripts with mature regions (mature_miRNA_variant vs
  non_coding_transcript_exon_variant suppression),
* frameshift (10 bp) introns inside the CDS,
* cds_start_NF with leading-N phase padding, cds_end_NF with an
  incomplete terminal codon,
* regulatory / motif / miRNA FEATURE context tables (features3.tsv).

Reads the committed genome.txt next to this script; writes
transcripts3.tsv + features3.tsv to the same directory (or an argv[1]
directory, created if missing).  The variant ladder is shared with
grids 1/2 (variants.tsv).
"""
import os
import sys

OUT = sys.argv[1] if len(sys.argv) > 1 else os.path.dirname(os.path.abspath(__file__))
os.makedirs(OUT, exist_ok=True)
genome = open(os.path.join(os.path.dirname(os.path.abspath(__file__)), "genome.txt")).read().strip()

COMP = str.maketrans("ACGT", "TGCA")
def rc(s): return s.translate(COMP)[::-1]
def sl(s, e): return genome[s - 1 : e]

def spliced(exons, strand):
    segs = [sl(s, e) for s, e in exons]
    fwd = "".join(segs)
    return fwd if strand >= 0 else rc(fwd)

def cdna_of(exons, strand, gpos):
    off = 0
    if strand >= 0:
        for s, e in exons:
            if s <= gpos <= e:
                return off + gpos - s + 1
            off += e - s + 1
    else:
        for s, e in reversed(exons):
            if s <= gpos <= e:
                return off + e - gpos + 1
            off += e - s + 1
    return None

CODON = {}
bases = "TCAG"
aas = "FFLLSSSSYY**CC*WLLLLPPPPHHQQRRRRIIIMTTTTNNKKSSRRVVVVAAAADDEEGGGG"
i = 0
for b1 in bases:
    for b2 in bases:
        for b3 in bases:
            CODON[b1 + b2 + b3] = aas[i]; i += 1
def translate(cds):
    return "".join(CODON.get(cds[i:i+3], "X") for i in range(0, len(cds) - 2, 3))

EXONS2 = [(1000, 1250), (1350, 1600)]
EXONS_FSI = [(1000, 1250), (1261, 1600)]  # 10 bp frameshift intron 1251-1260

rows = []
def mk(tid, strand, biotype, exons, cds=None, lead_n=0, trim_tail=0,
       mature=None, cds_start_nf=0, cds_end_nf=0):
    start, end = exons[0][0], exons[-1][1]
    sp = spliced(exons, strand)
    ccs = cce = ""
    cds_seq = tr_seq = ""
    cs = ce = ""
    if cds:
        cs, ce = cds
        c1, c2 = cdna_of(exons, strand, cds[0]), cdna_of(exons, strand, cds[1])
        ccs, cce = min(c1, c2), max(c1, c2)
        cds_seq = "N" * lead_n + sp[ccs - 1 : cce]
        if trim_tail:
            cds_seq = cds_seq[:-trim_tail]
            # the cached cdna coding end shrinks with the incomplete codon
            cce -= trim_tail
        tr = translate(cds_seq)
        tr_seq = tr[:-1] if tr.endswith("*") else tr
    rows.append([
        tid, "1", str(start), str(end), str(strand), biotype,
        str(cs), str(ce), str(ccs), str(cce),
        ";".join(f"{s}-{e}" for s, e in exons),
        sp,
        cds_seq, tr_seq,
        "", "", "", "", "", "", "",                       # 14-20 refseq/mapper arms unused
        ";".join(f"{s}-{e}" for s, e in (mature or [])),  # 21 mature miRNA regions (genomic)
        str(cds_start_nf), str(cds_end_nf),               # 22-23 incomplete-CDS flags
    ])

EXONS4 = [(1000, 1120), (1180, 1300), (1360, 1480), (1520, 1600)]

mk("NMDA", 1, "nonsense_mediated_decay", EXONS2, (1100, 1501))
mk("NMDB", -1, "nonsense_mediated_decay", EXONS2, (1100, 1501))
mk("MIRA", 1, "miRNA", [(1100, 1200)], mature=[(1120, 1160)])
mk("MIRB", -1, "miRNA", [(1100, 1200)], mature=[(1120, 1160)])
mk("FSIA", 1, "protein_coding", EXONS_FSI, (1100, 1501))
mk("FSIB", -1, "protein_coding", EXONS_FSI, (1100, 1501))
mk("NFPA", 1, "protein_coding", EXONS2, (1100, 1501), lead_n=2, cds_start_nf=1)
mk("NFEA", 1, "protein_coding", EXONS2, (1100, 1500), trim_tail=1, cds_end_nf=1)
mk("PPGA", 1, "polymorphic_pseudogene", EXONS2, (1100, 1501))
# wave 4: MULTI-intron shapes (three introns — donor/acceptor/splice-region
# families at every boundary, per-end HGVSc across interior introns) and
# the MINUS-strand incomplete-CDS twins
mk("QEXA", 1, "protein_coding", EXONS4, (1050, 1572))
mk("QEXB", -1, "protein_coding", EXONS4, (1050, 1572))
mk("NFPB", -1, "protein_coding", EXONS2, (1100, 1501), lead_n=2, cds_start_nf=1)
mk("NFEB", -1, "protein_coding", EXONS2, (1101, 1501), trim_tail=1, cds_end_nf=1)

with open(os.path.join(OUT, "transcripts3.tsv"), "w") as f:
    for r in rows:
        f.write("\t".join(r) + "\n")

# feature context: kind  id  start  end  feature_type
features = [
    ("reg", "RegA", 1050, 1150, "promoter"),
    ("reg", "RegA", 1050, 1150, "promoter"),          # duplicate id → single entry
    ("reg", "RegB", 1200, 1380, "enhancer"),          # spans the intron
    ("reg", "RegC", 1400, 1450, "TF_binding_site"),   # typed TFBS regulatory row
    ("reg", "RegD", 1455, 1460, ""),                  # untyped
    ("reg", "RegF", 1500, 1502, "open_chromatin_region"),  # tiny → ablatable
    ("motif", "MotA", 1100, 1115, ""),
    ("motif", "MotB", 1585, 1600, ""),
    ("mirna", "MirX", 1130, 1170, ""),
]
with open(os.path.join(OUT, "features3.tsv"), "w") as f:
    for k, fid, s, e, ft in features:
        f.write(f"{k}\t{fid}\t{s}\t{e}\t{ft}\n")

print("transcripts3:", len(rows), "features3:", len(features), "->", OUT)
