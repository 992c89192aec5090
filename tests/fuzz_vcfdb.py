"""Randomized custom-database generator fuzz: random genomes, GTF
annotations, and per-allele VCFs through the reference
vcf_database/CombineVcf.pl + CombinedVcfToDat.pl and
hprc_database/GtfToDat.pl vs db.vcf_to_dat / db.gtf_to_dat.

The combined-VCF table is byte-compared; the .dat outputs are compared
as RECORD SETS because the reference emits records by iterating Perl
hashes (CombinedVcfToDat.pl:127), whose order is per-process random.

Not collected by pytest (no test_ prefix) — run manually:
  python tests/fuzz_vcfdb.py <start_seed> <n_cases>
Requires the reference checkout at T1K_REFERENCE_SRC
(default /tmp/t1k-ref-src).
"""

import os
import random
import shutil
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF_SRC = os.environ.get("T1K_REFERENCE_SRC", "/tmp/t1k-ref-src")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = "/tmp/vcfdbfuzz"
BASES = "ACGT"


def _rand_seq(rng, n):
    return "".join(rng.choice(BASES) for _ in range(n))


def _gen_case(rng, case):
    chrom = rng.choice(["chr22", "7"])
    glen = rng.randint(4000, 7000)
    genome_seq = _rand_seq(rng, glen)
    genome = f"{case}/genome.fa"
    with open(genome, "w") as f:
        f.write(f">{chrom}\n")
        for i in range(0, glen, 70):
            f.write(genome_seq[i:i + 70] + "\n")

    # 1-2 genes, each 2-4 exons on a strand; a trailing decoy transcript
    # exercises the reference's dropped-final-transcript quirk
    genes = []
    gtf = f"{case}/anno.gtf"
    with open(gtf, "w") as f:
        f.write("#comment\n")
        pos = 300
        n_genes = rng.randint(1, 2)
        for gi in range(n_genes):
            gname = f"MYG{gi}"
            strand = rng.choice("+-")
            n_ex = rng.randint(2, 4)
            exons = []
            for _ in range(n_ex):
                ln = rng.randint(80, 250)
                exons.append((pos, pos + ln - 1))
                pos += ln + rng.randint(100, 300)
            genes.append((gname, strand, exons))
            for es, ee in exons:
                f.write(f"{chrom}\ttest\texon\t{es}\t{ee}\t.\t{strand}\t.\t"
                        f'gene_name "{gname}"; '
                        f'transcript_name "{gname}-201";\n')
            pos += rng.randint(200, 400)
        f.write(f"{chrom}\ttest\texon\t{pos}\t{pos + 100}\t.\t+\t.\t"
                f'gene_name "DECOY"; transcript_name "DECOY-201";\n')

    # per-allele VCFs: SNPs (and occasional deletions) inside gene spans
    vcfs = []
    for ai in range(rng.randint(1, 3)):
        gname, strand, exons = rng.choice(genes)
        name = f"{case}/{gname}_{ai + 2}.vcf"
        lo, hi = exons[0][0], exons[-1][1]
        rows = []
        for _ in range(rng.randint(1, 4)):
            p = rng.randint(lo, hi)
            ref = genome_seq[p - 1]
            if rng.random() < 0.25:
                ln = rng.randint(1, 3)
                rows.append((p, genome_seq[p - 1:p - 1 + ln + 1], "."))
            else:
                alt = rng.choice([b for b in BASES if b != ref])
                rows.append((p, ref, alt))
        rows.sort()
        with open(name, "w") as f:
            f.write("##header\n")
            for p, r, a in rows:
                f.write(f"{chrom}\t{p}\t.\t{r}\t{a}\t.\tPASS\n")
        vcfs.append(name)
    vlist = f"{case}/list.txt"
    with open(vlist, "w") as f:
        f.write("\n".join(vcfs) + "\n")
    return genome, gtf, vlist, genes


def _dat_records(text):
    return sorted(r for r in text.split("//\n") if r.strip())


def run_case(seed):
    rng = random.Random(seed)
    case = f"{OUT}/case_{seed}"
    shutil.rmtree(case, ignore_errors=True)
    os.makedirs(case)
    genome, gtf, vlist, genes = _gen_case(rng, case)
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    failures = []

    # ---- CombineVcf + CombinedVcfToDat chain ----
    default_allele = f"{genes[0][0]}*1"
    r = subprocess.run(
        ["perl", os.path.join(REF_SRC, "vcf_database/CombineVcf.pl"),
         default_allele, vlist], capture_output=True, text=True)
    if r.returncode == 0:
        combined = f"{case}/combined.tsv"
        with open(combined, "w") as f:
            f.write(r.stdout)
        m = subprocess.run(
            [sys.executable, "-m", "t1k_tpu.db.vcf_to_dat", "combine",
             default_allele, vlist],
            capture_output=True, text=True, env=env)
        if m.returncode != 0 or m.stdout != r.stdout:
            failures.append(("combine", m.returncode))
        r2 = subprocess.run(
            ["perl",
             os.path.join(REF_SRC, "vcf_database/CombinedVcfToDat.pl"),
             genome, gtf, combined], capture_output=True, text=True)
        if r2.returncode == 0:
            m2 = subprocess.run(
                [sys.executable, "-m", "t1k_tpu.db.vcf_to_dat", "todat",
                 genome, gtf, combined],
                capture_output=True, text=True, env=env)
            if (m2.returncode != 0
                    or _dat_records(m2.stdout) != _dat_records(r2.stdout)):
                failures.append(("todat", m2.returncode))

    # ---- GtfToDat ----
    allele_id = rng.choice(["001", "7"])
    r3 = subprocess.run(
        ["perl", os.path.join(REF_SRC, "hprc_database/GtfToDat.pl"),
         genome, gtf, allele_id], capture_output=True, text=True)
    if r3.returncode == 0:
        m3 = subprocess.run(
            [sys.executable, "-m", "t1k_tpu.db.gtf_to_dat", "gtf",
             genome, gtf, allele_id],
            capture_output=True, text=True, env=env)
        if (m3.returncode != 0
                or _dat_records(m3.stdout) != _dat_records(r3.stdout)):
            failures.append(("gtfdat", m3.returncode))

    if failures:
        print(f"seed {seed}: {failures}")
        return "fail"
    shutil.rmtree(case, ignore_errors=True)
    return "ok"


if __name__ == "__main__":
    start, n = int(sys.argv[1]), int(sys.argv[2])
    stats = {"ok": 0, "fail": 0}
    for seed in range(start, start + n):
        stats[run_case(seed)] += 1
        if (seed - start + 1) % 20 == 0:
            print(f"...{seed - start + 1} done: {stats}", flush=True)
    print(stats)
