"""Generate the shared differential-test grid: synthetic genome, transcripts,
variants. Emits transcripts.tsv, variants.tsv, genome.txt."""
import random

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

with open("/tmp/diffgrid/transcripts.tsv", "w") as f:
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

with open("/tmp/diffgrid/variants.tsv", "w") as f:
    for pos, r, a in variants:
        f.write(f"1\t{pos}\t{pos + len(r) - 1}\t{r}\t{a}\n")
open("/tmp/diffgrid/genome.txt", "w").write(genome)
print("transcripts:", len(TXS), "variants:", len(variants))
