"""HLA-scale end-to-end genotyper benchmark: 24 genes x 250 alleles,
12k read pairs. Reference genotyper vs our pipeline, byte-compare."""
import os, subprocess, sys, time
import numpy as np

sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))
from t1k_tpu.io.reads import read_seq_file, write_fastq, SeqRecord

CYP = os.environ.get("T1K_CYP2D6_IDX", "/root/reference/vcf_database/cyp2d6_idx") + "/cyp2d6_rna_seq.fa"
OUT = "/tmp/hlabench"
os.makedirs(OUT, exist_ok=True)
PANEL = f"{OUT}/panel.fa"
FQ1, FQ2 = f"{OUT}/r_1.fq", f"{OUT}/r_2.fq"

if not os.path.exists(PANEL):
    src = [r for r in read_seq_file(CYP)][:250]
    rng = np.random.default_rng(7)
    out = []
    for gi in range(24):
        gene = f"GEN{chr(65 + gi // 26)}{chr(65 + gi % 26)}"
        n_mut = 40 * (gi % 6) + 25 * (gi // 6)
        pos = rng.integers(0, 1200, size=n_mut)
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
    print("panel:", len(out), "alleles")

if not os.path.exists(FQ1):
    from t1k_tpu.tools.simulate import SimConfig, simulate_pairs

    by_name = {}
    for r in read_seq_file(PANEL):
        by_name[r.id] = r
    # two alleles from each of 8 genes
    chosen, abund = [], []
    rng = np.random.default_rng(13)
    genes = sorted({n.split("*")[0] for n in by_name})
    for g in genes[:8]:
        alleles = sorted(n for n in by_name if n.startswith(g + "*"))
        pick = rng.choice(len(alleles), 2, replace=False)
        for j, p in enumerate(pick):
            chosen.append(by_name[alleles[p]])
            abund.append(1.0 - 0.3 * j)
    r1, r2 = simulate_pairs(chosen, abund, SimConfig(n_pairs=12000, seed=3))
    write_fastq(FQ1, r1)
    write_fastq(FQ2, r2)
    print("reads written")

mode = sys.argv[1] if len(sys.argv) > 1 else "both"
threads = sys.argv[2] if len(sys.argv) > 2 else "1"

if mode in ("both", "ref"):
    t0 = time.time()
    subprocess.run([os.environ.get("T1K_REFERENCE_BIN", "/tmp/t1k-ref") + "/genotyper", "-f", PANEL, "-1", FQ1,
                    "-2", FQ2, "-o", f"{OUT}/ref", "-t", threads],
                   check=True, capture_output=True)
    print(f"reference: {time.time()-t0:.1f}s")

if mode in ("both", "mine"):
    from t1k_tpu.cli.genotype import main as gmain

    t0 = time.time()
    rc = gmain(["-f", PANEL, "-1", FQ1, "-2", FQ2, "-o", f"{OUT}/mine",
                "-t", threads])
    print(f"mine: {time.time()-t0:.1f}s rc={rc}")

if mode == "both":
    for suf in ("_genotype.tsv", "_allele.tsv"):
        a = open(f"{OUT}/ref{suf}").read()
        b = open(f"{OUT}/mine{suf}").read()
        print(suf, "identical" if a == b else "DIFFERS")


if mode == "chain":
    import shutil
    ref_bin_dir = os.environ.get("T1K_REFERENCE_BIN", "/tmp/t1k-ref")
    t0 = time.time()
    subprocess.run(["perl", os.path.join(ref_bin_dir, "run-t1k"),
                    "-f", PANEL, "-1", FQ1, "-2", FQ2,
                    "--od", f"{OUT}/refchain", "-o", "c", "-t", threads],
                   check=True, capture_output=True)
    t_ref = time.time() - t0
    print(f"reference chain: {t_ref:.1f}s")

    from t1k_tpu.cli.run import main as rmain

    t0 = time.time()
    rc = rmain(["-f", PANEL, "-1", FQ1, "-2", FQ2,
                "--od", f"{OUT}/minechain", "-o", "c", "-t", threads])
    t_mine = time.time() - t0
    print(f"mine chain: {t_mine:.1f}s rc={rc}")
    for suf in ("_genotype.tsv", "_allele.tsv", "_allele.vcf"):
        a = open(f"{OUT}/refchain/c{suf}").read()
        b = open(f"{OUT}/minechain/c{suf}").read()
        print(suf, "identical" if a == b else "DIFFERS")
