"""Generate the shared differential-test grid: synthetic genome, transcripts,
variants. Emits transcripts.tsv, transcripts2.tsv, variants.tsv, genome.txt
to this script's directory (or an argv[1] directory, created if missing)."""
import os
import random
import sys

OUT = sys.argv[1] if len(sys.argv) > 1 else os.path.dirname(os.path.abspath(__file__))
os.makedirs(OUT, exist_ok=True)


def _p(name):
    return os.path.join(OUT, name)

rng = random.Random(42)
N = 3000
genome = "".join(rng.choice("ACGT") for _ in range(N))  # 1-based chrom "1"

COMP = str.maketrans("ACGT", "TGCA")
def rc(s): return s.translate(COMP)[::-1]
def sl(s, e): return genome[s - 1 : e]

def spliced(exons, strand):
    segs = [sl(s, e) for s, e in exons]
    fwd = "".join(segs)
    return fwd if strand >= 0 else rc(fwd)

def cdna_of(exons, strand, gpos):
    # 1-based cdna index of genomic pos
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
TXS = []
def mk(tid, strand, biotype, exons, cds=None, with_seq=True):
    start, end = exons[0][0], exons[-1][1]
    row = dict(id=tid, strand=strand, biotype=biotype, exons=exons,
               start=start, end=end, cds=cds, with_seq=with_seq)
    if cds and with_seq:
        sp = spliced(exons, strand)
        c1 = cdna_of(exons, strand, cds[0]); c2 = cdna_of(exons, strand, cds[1])
        ccs, cce = min(c1, c2), max(c1, c2)
        row["ccs"], row["cce"] = ccs, cce
        row["spliced"] = sp
        row["cds_seq"] = sp[ccs - 1 : cce]
        tr = translate(row["cds_seq"])
        row["tr_seq"] = tr[:-1] if tr.endswith("*") else tr
    elif cds:
        row["ccs"] = row["cce"] = None
    return row

TXS.append(mk("ENSTA", 1, "protein_coding", EXONS2, (1100, 1501)))
TXS.append(mk("ENSTB", -1, "protein_coding", EXONS2, (1100, 1501)))
TXS.append(mk("ENSTC", 1, "lincRNA", EXONS2))
TXS.append(mk("ENSTD", -1, "lincRNA", EXONS2))
TXS.append(mk("ENSTE", 1, "protein_coding", [(1000, 1600)], (1100, 1501)))
TXS.append(mk("ENSTF", 1, "protein_coding", EXONS2, (1100, 1501), with_seq=False))

with open(_p("transcripts.tsv"), "w") as f:
    for t in TXS:
        f.write("\t".join([
            t["id"], "1", str(t["start"]), str(t["end"]), str(t["strand"]),
            t["biotype"],
            str(t["cds"][0]) if t["cds"] else "",
            str(t["cds"][1]) if t["cds"] else "",
            str(t.get("ccs") or ""), str(t.get("cce") or ""),
            ";".join(f"{s}-{e}" for s, e in t["exons"]),
            t.get("spliced", ""), t.get("cds_seq", ""), t.get("tr_seq", ""),
        ]) + "\n")

variants = []
def nb(b): return "ACGT"[("ACGT".index(b) + 1) % 4]
for pos in range(960, 1641):                      # dense SNVs
    variants.append((pos, genome[pos - 1], nb(genome[pos - 1])))
for pos in range(700, 2001, 10):                  # sparse distance SNVs
    variants.append((pos, genome[pos - 1], nb(genome[pos - 1])))
for pos in range(960, 1638, 3):                   # 1bp deletions (VCF anchored)
    variants.append((pos, genome[pos - 1 : pos + 1], genome[pos - 1]))
for pos in range(961, 1639, 3):                   # 1bp insertions
    variants.append((pos, genome[pos - 1], genome[pos - 1] + nb(genome[pos - 1])))
for pos in range(962, 1634, 7):                   # 3bp deletions
    variants.append((pos, genome[pos - 1 : pos + 3], genome[pos - 1]))
for pos in range(963, 1635, 7):                   # 3bp insertions (repeat-ish)
    ins = genome[pos : pos + 3] or "GGA"
    variants.append((pos, genome[pos - 1], genome[pos - 1] + ins))
for pos in range(964, 1630, 11):                  # 2bp MNVs
    variants.append((pos, genome[pos - 1 : pos + 1],
                     nb(genome[pos - 1]) + nb(genome[pos])))

with open(_p("variants.tsv"), "w") as f:
    for pos, r, a in variants:
        f.write(f"1\t{pos}\t{pos + len(r) - 1}\t{r}\t{a}\n")
open(_p("genome.txt"), "w").write(genome)
print("transcripts:", len(TXS), "variants:", len(variants))

# ---- round-9 extension: RefSeq-edited + mapper transcripts -------------
# ENSTG / NM_G.1: + strand single-exon, RNA-edit INSERTION of 3 bases at
# cdna 151 (start=151, end=150, replacement GAG), BestRefSeq bam_edit ok.
# ENSTH / NM_H.1: same shape but carrying explicit cdna mapper segments
# (genomic [1000,1149] -> cdna 1..150, [1150,1600] -> cdna 154..604).
rows2 = []
G_TX_START, G_TX_END = 1000, 1600
G_CDS_START, G_CDS_END = 1100, 1501
genomic_spliced = sl(G_TX_START, G_TX_END)           # 601 bases
EDIT_AT = 151                                        # insert AFTER cdna 150
EDIT_SEQ = "GAG"
edited_spliced = genomic_spliced[:EDIT_AT - 1] + EDIT_SEQ + genomic_spliced[EDIT_AT - 1:]
ccs = G_CDS_START - G_TX_START + 1                   # 101 (before the edit)
cce_raw = G_CDS_END - G_TX_START + 1                 # 502
cce = cce_raw + len(EDIT_SEQ)                        # 505 in edited space
edited_cds = edited_spliced[ccs - 1 : cce]
canonical_cds = genomic_spliced[ccs - 1 : cce_raw]
etr = translate(edited_cds); etr = etr[:-1] if etr.endswith("*") else etr
ctr = translate(canonical_cds); ctr = ctr[:-1] if ctr.endswith("*") else ctr

def emit(tid, mapper):
    segs = ""
    if mapper:
        segs = (f"{G_TX_START}-{G_TX_START + EDIT_AT - 2}-1-{EDIT_AT - 1}-1;"
                f"{G_TX_START + EDIT_AT - 1}-{G_TX_END}-{EDIT_AT + 3}-{cce + 99}-1")
    rows2.append("\t".join([
        tid, "1", str(G_TX_START), str(G_TX_END), "1", "protein_coding",
        str(G_CDS_START), str(G_CDS_END), str(ccs), str(cce),
        f"{G_TX_START}-{G_TX_END}",
        edited_spliced, edited_cds, etr,
        "BestRefSeq", "ok", "1", f"{EDIT_AT}-{EDIT_AT - 1}-{len(EDIT_SEQ)}",
        canonical_cds, ctr, segs,
    ]))

emit("NM_G.1", mapper=False)
emit("NM_H.1", mapper=True)


# ENSTI / NM_I.1: MINUS strand with the same 3-base edit insertion at
# transcript cdna 151; ENSTJ / NM_J.1: + strand with a DELETION edit
# (transcript lacks genomic cdna bases 151-153).
g_rc = rc(genomic_spliced)                       # transcript orientation (−)
edited_rc = g_rc[:150] + EDIT_SEQ + g_rc[150:]
i_ccs = G_TX_END - G_CDS_END + 1                 # cdna of genomic cds_end (100)
i_cce_raw = G_TX_END - G_CDS_START + 1           # 501
i_cce = i_cce_raw + 3                            # 504 edited
i_edited_cds = edited_rc[i_ccs - 1 : i_cce]
i_canonical_cds = g_rc[i_ccs - 1 : i_cce_raw]
i_etr = translate(i_edited_cds); i_etr = i_etr[:-1] if i_etr.endswith("*") else i_etr
i_ctr = translate(i_canonical_cds); i_ctr = i_ctr[:-1] if i_ctr.endswith("*") else i_ctr
rows2.append("\t".join([
    "NM_I.1", "1", str(G_TX_START), str(G_TX_END), "-1", "protein_coding",
    str(G_CDS_START), str(G_CDS_END), str(i_ccs), str(i_cce),
    f"{G_TX_START}-{G_TX_END}",
    edited_rc, i_edited_cds, i_etr,
    "BestRefSeq", "ok", "1", "151-150-3",
    i_canonical_cds, i_ctr, "",
]))

# deletion edit: transcript drops genomic cdna 151-153 (start=151, end=153,
# replacement_len=0)
del_spliced = genomic_spliced[:150] + genomic_spliced[153:]
j_cce = cce_raw - 3
j_edited_cds = del_spliced[ccs - 1 : j_cce]
j_canonical_cds = genomic_spliced[ccs - 1 : cce_raw]
j_etr = translate(j_edited_cds); j_etr = j_etr[:-1] if j_etr.endswith("*") else j_etr
j_ctr = translate(j_canonical_cds); j_ctr = j_ctr[:-1] if j_ctr.endswith("*") else j_ctr
rows2.append("\t".join([
    "NM_J.1", "1", str(G_TX_START), str(G_TX_END), "1", "protein_coding",
    str(G_CDS_START), str(G_CDS_END), str(ccs), str(j_cce),
    f"{G_TX_START}-{G_TX_END}",
    del_spliced, j_edited_cds, j_etr,
    "BestRefSeq", "ok", "1", "151-153-0",
    j_canonical_cds, j_ctr, "",
]))


# NM_K.1: + strand TWO-EXON with the 3-base edit inside exon 1 (cdna 151)
# NM_L.1: + strand two-exon with the edit inside exon 2 (cdna 331)
EX2 = [(1000, 1250), (1350, 1600)]
def cdna2(gpos):
    return cdna_of(EX2, 1, gpos)
sp2 = spliced(EX2, 1)                       # 502 bases
for tid, edit_at in (("NM_K.1", 151), ("NM_L.1", 331)):
    ed_sp = sp2[: edit_at - 1] + EDIT_SEQ + sp2[edit_at - 1 :]
    ccs2 = cdna2(1100)                      # 101
    cce2_raw = cdna2(1501)                  # 403
    ccs2_e = ccs2 + (3 if edit_at <= ccs2 else 0)
    cce2_e = cce2_raw + (3 if edit_at <= cce2_raw else 0)
    cds2 = ed_sp[ccs2_e - 1 : cce2_e]
    can2 = sp2[ccs2 - 1 : cce2_raw]
    tr2 = translate(cds2); tr2 = tr2[:-1] if tr2.endswith("*") else tr2
    ctr2 = translate(can2); ctr2 = ctr2[:-1] if ctr2.endswith("*") else ctr2
    rows2.append("\t".join([
        tid, "1", "1000", "1600", "1", "protein_coding",
        "1100", "1501", str(ccs2_e), str(cce2_e),
        "1000-1250;1350-1600",
        ed_sp, cds2, tr2,
        "BestRefSeq", "ok", "1", f"{edit_at}-{edit_at - 1}-3",
        can2, ctr2, "",
    ]))
with open(_p("transcripts2.tsv"), "w") as f:
    f.write("\n".join(rows2) + "\n")
print("extension transcripts:", len(rows2))
