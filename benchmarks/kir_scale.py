"""KIR-WGS-scale end-to-end genotyper benchmark: genomic (dna-mode)
alleles with N-separator intron padding, 16 genes x ~120 alleles, 10k
read pairs, --relaxIntronAlign (the kir-wgs preset's genotyper flags).
Reference genotyper vs our pipeline, byte-compare.

  python benchmarks/kir_scale.py [both|ref|mine] [threads]
"""
import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from t1k_tpu.io.reads import read_seq_file  # noqa: E402

CYP = os.environ.get(
    "T1K_CYP2D6_IDX", "/root/reference/vcf_database/cyp2d6_idx"
) + "/cyp2d6_dna_seq.fa"
OUT = "/tmp/kirbench"
os.makedirs(OUT, exist_ok=True)
PANEL = f"{OUT}/panel.fa"
FQ1, FQ2 = f"{OUT}/r_1.fq", f"{OUT}/r_2.fq"

if not os.path.exists(PANEL):
    src = [r for r in read_seq_file(CYP)][:120]
    rng = np.random.default_rng(17)
    out = []
    for gi in range(16):
        gene = f"KIRX{chr(65 + gi)}"
        n_mut = 60 * (gi % 5) + 30 * (gi // 5)
        pos = rng.integers(0, 4000, size=n_mut)
        sub = rng.integers(1, 4, size=n_mut)
        for rec in src:
            seq = list(rec.seq)
            for p, s in zip(pos, sub):
                if p < len(seq) and seq[p] in "ACGT":
                    seq[p] = "ACGT"[("ACGT".index(seq[p]) + s) % 4]
            allele = rec.id.split("*")[1]
            out.append((f"{gene}*{allele}", "".join(seq), rec.comment))
    with open(PANEL, "w") as f:
        for n, s, c in out:
            f.write(f">{n} {c}\n{s}\n")
    print("panel:", len(out), "alleles (dna mode, N separators preserved)")

if not os.path.exists(FQ1):
    from t1k_tpu.tools.simulate import SimConfig, simulate_pairs

    by_name = {}
    for r in read_seq_file(PANEL):
        by_name.setdefault(r.id.split("*")[0], []).append(r)
    genes = sorted(by_name)
    alleles, weights = [], []
    rng = np.random.default_rng(23)
    for gi, g in enumerate(genes):
        k = rng.integers(1, 3)
        for rec in rng.choice(len(by_name[g]), size=k, replace=False):
            alleles.append(by_name[g][rec])
            weights.append(float(rng.random() * 0.9 + 0.1))
    r1, r2 = simulate_pairs(alleles, weights,
                            SimConfig(n_pairs=10000, seed=5, read_len=100,
                                      error_rate=0.004))
    with open(FQ1, "w") as f1, open(FQ2, "w") as f2:
        for a, b in zip(r1, r2):
            f1.write(f"@{a.id}\n{a.seq}\n+\n{a.qual}\n")
            f2.write(f"@{b.id}\n{b.seq}\n+\n{b.qual}\n")
    print("reads written")

mode = sys.argv[1] if len(sys.argv) > 1 else "both"
threads = sys.argv[2] if len(sys.argv) > 2 else "1"

if mode in ("both", "ref"):
    t0 = time.time()
    subprocess.run([os.environ.get("T1K_REFERENCE_BIN", "/tmp/t1k-ref")
                    + "/genotyper", "-f", PANEL, "-1", FQ1, "-2", FQ2,
                    "-o", f"{OUT}/ref", "-t", threads, "-s", "0.9",
                    "--relaxIntronAlign"],
                   check=True, capture_output=True)
    print(f"reference: {time.time()-t0:.1f}s")

if mode in ("both", "mine"):
    from t1k_tpu.cli.genotype import main as gmain

    t0 = time.time()
    rc = gmain(["-f", PANEL, "-1", FQ1, "-2", FQ2, "-o", f"{OUT}/mine",
                "-t", threads, "-s", "0.9", "--relaxIntronAlign"])
    print(f"mine: {time.time()-t0:.1f}s rc={rc}")

if mode == "both":
    for suf in ("_genotype.tsv", "_allele.tsv"):
        a = open(f"{OUT}/ref{suf}").read()
        b = open(f"{OUT}/mine{suf}").read()
        print(suf, "identical" if a == b else "DIFFERS")
