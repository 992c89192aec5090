import os, sys, time, subprocess
import numpy as np

sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))
from t1k_tpu.constants import revcomp_str
from t1k_tpu.io.bam import BamRecord, BamWriter
from t1k_tpu.io.reads import read_seq_file
from t1k_tpu.tools.simulate import SimConfig, simulate_pairs

CYP = os.environ.get("T1K_CYP2D6_IDX", "/root/reference/vcf_database/cyp2d6_idx") + "/cyp2d6_rna_seq.fa"
OUT = "/tmp/bambench"
os.makedirs(OUT, exist_ok=True)
bam = f"{OUT}/big.bam"
coord = f"{OUT}/coord.fa"

if not os.path.exists(bam):
    by_name = {r.id: r for r in read_seq_file(CYP)}
    r1, r2 = simulate_pairs([by_name["CYP2D6*1"], by_name["CYP2D6*4"]],
                            [1.0, 0.8], SimConfig(n_pairs=1000, seed=87))
    with open(coord, "w") as f:
        for a in ("CYP2D6*1", "CYP2D6*4"):
            f.write(f">{a} chr22 10000 11500 +\n{by_name[a].seq}\n")
    rng = np.random.default_rng(9)
    bases = np.array(list("ACGT"))
    M = 0
    def pair(name, s1, q1, s2, q2, tid, p1, p2):
        a = BamRecord(name, 0x63, tid, p1, 60, [(len(s1), M)], tid, p2,
                      p2 - p1 + len(s2), s1, q1, {})
        b = BamRecord(name, 0x93, tid, p2, 60, [(len(s2), M)], tid, p1,
                      -(p2 - p1 + len(s2)), revcomp_str(s2), q2[::-1], {})
        return a, b
    chr22, alt, unmapped = [], [], []
    # 1000 on-target pairs in the gene window
    for i in range(500):
        p1 = 10050 + i * 2
        a, b = pair(r1[i].id, r1[i].seq, r1[i].qual, r2[i].seq, r2[i].qual,
                    0, p1, p1 + 150)
        chr22 += [a, b]
    # ~48k background pairs across the chromosome (filtered by sweep)
    qs = "I" * 100
    bg = ["".join(rng.choice(bases, 100)) for _ in range(64)]
    for i in range(48000):
        p1 = 20000 + i * 10
        a, b = pair(f"bg_{i}", bg[i % 64], qs, bg[(i * 7 + 3) % 64], qs,
                    0, p1, p1 + 150)
        chr22 += [a, b]
    # 200 alt-contig pairs
    for i in range(100):
        p1 = 500 + i * 25
        a, b = pair(r1[500 + i].id, r1[500 + i].seq, r1[500 + i].qual,
                    r2[500 + i].seq, r2[500 + i].qual, 1, p1, p1 + 150)
        alt += [a, b]
    # 800 unaligned templates: 200 on-target + 200 background
    for i in range(200):
        j = 600 + i
        unmapped += [
            BamRecord(r1[j].id, 0x4D, -1, -1, 0, [], -1, -1, 0, r1[j].seq, r1[j].qual, {}),
            BamRecord(r1[j].id, 0x8D, -1, -1, 0, [], -1, -1, 0, r2[j].seq, r2[j].qual, {}),
        ]
    for i in range(200):
        unmapped += [
            BamRecord(f"ubg_{i}", 0x4D, -1, -1, 0, [], -1, -1, 0, bg[i % 64], qs, {}),
            BamRecord(f"ubg_{i}", 0x8D, -1, -1, 0, [], -1, -1, 0, bg[(i * 3 + 1) % 64], qs, {}),
        ]
    chr22.sort(key=lambda r: r.pos)
    alt.sort(key=lambda r: r.pos)
    w = BamWriter(bam, ["chr22", "chr22_alt"], [10000000, 100000],
                  "@HD\tVN:1.6\tSO:coordinate\n")
    n = 0
    for r in chr22 + alt + unmapped:
        w.write(r); n += 1
    w.close()
    print("records:", n)

# reference
t0 = time.time()
subprocess.run([os.environ.get("T1K_REFERENCE_BIN", "/tmp/t1k-ref") + "/bam-extractor", "-f", coord, "-b", bam, "-o", f"{OUT}/ref"], check=True,
               capture_output=True)
t_ref = time.time() - t0
print(f"reference: {t_ref:.2f}s")

from t1k_tpu.io.bam import extract_from_bam
t0 = time.time()
stats = extract_from_bam(bam, coord, coord, f"{OUT}/mine")
t_mine = time.time() - t0
print(f"mine: {t_mine:.2f}s  candidates={stats['candidates']}")

import hashlib
for suf in ("_1.fq", "_2.fq"):
    a = open(f"{OUT}/ref{suf}", "rb").read()
    b = open(f"{OUT}/mine{suf}", "rb").read()
    print(suf, "identical" if a == b else "DIFFERS")
