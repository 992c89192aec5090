"""Randomized analyzer/variant-caller fuzz: synthetic panels with novel
SNPs injected into the read source (mutated allele sequences that are
absent from the panel), run through reference genotyper+analyzer and
cli.genotype+cli.analyze, byte-comparing the VCF and re-quantification.

Not collected by pytest (no test_ prefix) — run manually:
  python tests/fuzz_analyzer.py <start_seed> <n_cases>
Requires the reference binaries (see tests/make_goldens.py docstring);
build with:  cp -r /root/reference /tmp/t1k-src && make -C /tmp/t1k-src
"""

import os
import random
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from t1k_tpu.io.reads import SeqRecord, write_fastq  # noqa: E402
from t1k_tpu.tools.simulate import SimConfig, simulate_pairs  # noqa: E402
from tests.fuzz_genotyper import make_panel  # noqa: E402

REF_DIR = os.environ.get("T1K_REFERENCE_BIN", "/tmp/t1k-ref")
OUT = "/tmp/anfuzz"
BASES = "ACGT"


def _inject_snps(rng, seq, comment, n_snps):
    """Substitute n_snps positions, biased into exon regions so the
    variant caller has exonic candidates to emit."""
    toks = comment.split()
    n_ex = int(toks[0])
    exons = [(int(toks[1 + 2 * i]), int(toks[2 + 2 * i]))
             for i in range(n_ex)]
    s = list(seq)
    for _ in range(n_snps):
        if rng.random() < 0.8:
            es, ee = rng.choice(exons)
            pos = rng.randint(es, ee)
        else:
            pos = rng.randrange(len(s))
        if s[pos] in BASES:
            s[pos] = BASES[(BASES.index(s[pos]) + rng.randint(1, 3)) % 4]
    return "".join(s)


def run_case(seed):
    rng = random.Random(10_000_000 + seed)
    os.makedirs(OUT, exist_ok=True)
    dna = rng.random() < 0.35
    panel = f"{OUT}/panel_{seed}.fa"
    records = make_panel(rng, panel, dna)

    genes = sorted({r[0].split("*")[0] for r in records})
    by_gene = {g: [r for r in records if r[0].startswith(g + "*")]
               for g in genes}
    chosen, abund = [], []
    for g in genes:
        for r in rng.sample(by_gene[g], min(len(by_gene[g]), rng.randint(1, 2))):
            seq = r[1]
            if rng.random() < 0.7:  # novel-variant carrier
                n_snps = (rng.randint(4, 10)
                          if os.environ.get("T1K_FUZZ_BIG")
                          else rng.randint(1, 3))
                seq = _inject_snps(rng, seq, r[2], n_snps)
            chosen.append(SeqRecord(r[0], seq, None, r[2]))
            abund.append(rng.uniform(0.4, 1.0))
    n_pairs = (rng.randint(500, 1200) if os.environ.get("T1K_FUZZ_BIG")
               else rng.randint(150, 500))
    cfg = SimConfig(n_pairs=n_pairs, seed=seed,
                    read_len=rng.choice([75, 100]),
                    error_rate=rng.choice([0.0, 0.005]))
    r1, r2 = simulate_pairs(chosen, abund, cfg)
    paired = rng.random() < 0.75
    p1, p2 = f"{OUT}/r1_{seed}.fq", f"{OUT}/r2_{seed}.fq"
    write_fastq(p1, r1)
    if paired:
        write_fastq(p2, r2)

    gargs = []
    aargs = []
    if dna and rng.random() < 0.7:
        gargs += ["--relaxIntronAlign"]
        aargs += ["--relaxIntronAlign"]
    if rng.random() < 0.2:
        aargs += ["--varMaxGroup", rng.choice(["2", "-1"])]
    inp = ["-1", p1, "-2", p2] if paired else ["-u", p1]

    refp, minep = f"{OUT}/ref_{seed}", f"{OUT}/mine_{seed}"
    r = subprocess.run([f"{REF_DIR}/genotyper", "-f", panel, "-o", refp]
                       + gargs + inp, capture_output=True)
    if r.returncode != 0:
        return "refcrash"
    al = ([f"-1", f"{refp}_aligned_1.fa", "-2", f"{refp}_aligned_2.fa"]
          if paired else ["-u", f"{refp}_aligned.fa"])
    r = subprocess.run([f"{REF_DIR}/analyzer", "-f", panel, "-a",
                        f"{refp}_allele.tsv", "-o", refp + "_an"]
                       + aargs + al, capture_output=True)
    if r.returncode != 0:
        return "refcrash"

    from t1k_tpu.cli.analyze import main as amain
    from t1k_tpu.cli.genotype import main as gmain

    if gmain(["-f", panel, "-o", minep] + gargs + inp) != 0:
        print(f"seed {seed}: genotype rc!=0")
        return "fail"
    mal = ([f"-1", f"{minep}_aligned_1.fa", "-2", f"{minep}_aligned_2.fa"]
           if paired else ["-u", f"{minep}_aligned.fa"])
    if amain(["-f", panel, "-a", f"{minep}_allele.tsv", "-o", minep + "_an"]
             + aargs + mal) != 0:
        print(f"seed {seed}: analyze rc!=0")
        return "fail"

    ok = True
    for suf in ("_allele.tsv", "_an_allele.vcf"):
        a = open(refp + suf).read()
        b = open(minep + suf).read()
        if a != b:
            print(f"seed {seed}: DIFF {suf} (dna={dna} gargs={gargs} "
                  f"aargs={aargs} paired={paired})")
            ok = False
    if ok:
        for f in os.listdir(OUT):
            if f"_{seed}." in f or f.endswith(f"_{seed}") or f"_{seed}_" in f:
                os.unlink(os.path.join(OUT, f))
    return "ok" if ok else "fail"


if __name__ == "__main__":
    start, n = int(sys.argv[1]), int(sys.argv[2])
    stats = {"ok": 0, "fail": 0, "refcrash": 0}
    vcf_lines = 0
    for seed in range(start, start + n):
        stats[run_case(seed)] += 1
        if (seed - start + 1) % 20 == 0:
            print(f"...{seed - start + 1} done: {stats}", flush=True)
    print(stats)
