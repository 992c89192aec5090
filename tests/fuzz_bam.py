"""Randomized BAM-extraction fuzz: generate structured-random BAMs,
run the reference bam-extractor and our extract_from_bam, byte-compare.

Not collected by pytest (no test_ prefix) — run manually:
  python tests/fuzz_bam.py <start_seed> <n_cases>
Requires the reference binaries (see tests/make_goldens.py docstring);
build with:  cp -r /root/reference /tmp/t1k-src && make -C /tmp/t1k-src
"""
import os, subprocess, sys, random
import numpy as np

sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))
from t1k_tpu.constants import revcomp_str
from t1k_tpu.io.bam import BamRecord, BamWriter, extract_from_bam
from t1k_tpu.io.reads import read_seq_file
from t1k_tpu.tools.simulate import SimConfig, simulate_pairs

CYP = os.environ.get("T1K_CYP2D6_IDX", "/root/reference/vcf_database/cyp2d6_idx") + "/cyp2d6_rna_seq.fa"
REF_BIN = os.environ.get("T1K_REFERENCE_BIN", "/tmp/t1k-ref") + "/bam-extractor"
OUT = "/tmp/bamfuzz"
os.makedirs(OUT, exist_ok=True)

by_name = {r.id: r for r in read_seq_file(CYP)}
ALLELES = [by_name["CYP2D6*1"], by_name["CYP2D6*4"]]


def gen_case(seed):
    rng = random.Random(seed)
    nprng = np.random.default_rng(seed)
    bases = "ACGT"
    paired = rng.random() < 0.7
    rl = rng.choice([75, 100, 150])
    n_sim = rng.randint(30, 120)
    r1, r2 = simulate_pairs(ALLELES, [1.0, 0.8],
                            SimConfig(n_pairs=n_sim, seed=seed, read_len=rl))
    gene_start = rng.randint(5000, 20000)
    gene_end = gene_start + rng.randint(800, 2500)
    coord = f"{OUT}/coord_{seed}.fa"
    with open(coord, "w") as f:
        for a in ("CYP2D6*1", "CYP2D6*4"):
            f.write(f">{a} chr22 {gene_start} {gene_end} +\n{by_name[a].seq}\n")

    refs = ["chr22", "chr22_alt", "HLA-DRB1*15.01"]
    reflens = [10_000_000, 200000, 20000]
    M = 0

    def rand_seq(n):
        return "".join(rng.choice(bases) for _ in range(n))

    def mk_pair(name, s1, q1, s2, q2, tid, p1, p2, extra_flag=0, tags=None):
        t = tags or {}
        a = BamRecord(name, 0x63 | extra_flag, tid, p1, 60, [(len(s1), M)],
                      tid, p2, p2 - p1 + len(s2), s1, q1, dict(t))
        b = BamRecord(name, 0x93 | extra_flag, tid, p2, 60, [(len(s2), M)],
                      tid, p1, -(p2 - p1 + len(s2)), revcomp_str(s2),
                      (q2 or "")[::-1] or None, dict(t))
        return a, b

    aligned = {0: [], 1: [], 2: []}
    unmapped = []
    si = 0

    def next_sim():
        nonlocal si
        r = (r1[si % n_sim], r2[si % n_sim])
        si += 1
        return r

    n_events = rng.randint(20, 90)
    for i in range(n_events):
        kind = rng.random()
        name = f"f{seed}_{i}"
        if rng.random() < 0.3:
            name += rng.choice(["/1", "/2"]) if not paired else ""
        tags = {}
        if rng.random() < 0.25:
            tags = {"CB": "".join(rng.choice(bases) for _ in range(8))}
        if rng.random() < 0.2:
            tags["UB"] = "".join(rng.choice(bases) for _ in range(10))
        if kind < 0.35:
            # aligned near/inside the gene window (boundary stress)
            a, b = next_sim()
            p1 = rng.choice([
                gene_start - rl, gene_start - rl + 1, gene_start - 1,
                gene_start, gene_end - 1, gene_end, gene_end + 1,
                rng.randint(gene_start, gene_end),
            ])
            p1 = max(1, p1)
            p2 = p1 + rng.randint(rl, rl + 300)
            if paired:
                aligned[0].extend(mk_pair(name, a.seq, a.qual, b.seq, b.qual,
                                          0, p1, p2, tags=tags))
            else:
                aligned[0].append(BamRecord(name, 0x0, 0, p1, 60,
                                            [(rl, M)], -1, -1, 0, a.seq,
                                            a.qual, dict(tags)))
        elif kind < 0.5:
            # background far away
            p1 = rng.randint(100000, 9_000_000)
            s1, s2 = rand_seq(rl), rand_seq(rl)
            if paired:
                aligned[0].extend(mk_pair(name, s1, "I" * rl, s2, "I" * rl,
                                          0, p1, p1 + rl + 50, tags=tags))
            else:
                aligned[0].append(BamRecord(name, 0x0, 0, p1, 60, [(rl, M)],
                                            -1, -1, 0, s1, "I" * rl,
                                            dict(tags)))
        elif kind < 0.62:
            # alt contig
            a, b = next_sim()
            tid = rng.choice([1, 2])
            p1 = rng.randint(100, reflens[tid] - 2000)
            if paired:
                aligned[tid].extend(mk_pair(name, a.seq, a.qual, b.seq,
                                            b.qual, tid, p1, p1 + rl + 50,
                                            tags=tags))
            else:
                aligned[tid].append(BamRecord(name, 0x0, tid, p1, 60,
                                              [(rl, M)], -1, -1, 0, a.seq,
                                              a.qual, dict(tags)))
        elif kind < 0.78:
            # unaligned template (on-target or background)
            if rng.random() < 0.6:
                a, b = next_sim()
                s1, q1, s2, q2 = a.seq, a.qual, b.seq, b.qual
            else:
                s1, q1, s2, q2 = rand_seq(rl), "I" * rl, rand_seq(rl), "I" * rl
            if rng.random() < 0.1:
                s1 = "N" * rl  # low complexity
            if paired:
                unmapped.append(BamRecord(name, 0x4D, -1, -1, 0, [], -1, -1,
                                          0, s1, q1, dict(tags)))
                unmapped.append(BamRecord(name, 0x8D, -1, -1, 0, [], -1, -1,
                                          0, s2, q2, dict(tags)))
            else:
                unmapped.append(BamRecord(name, 0x4, -1, -1, 0, [], -1, -1,
                                          0, s1, q1, dict(tags)))
        elif kind < 0.88:
            # secondary / supplementary (must be ignored in pass 2 and
            # general info)
            a, b = next_sim()
            fl = rng.choice([0x100, 0x800])
            p1 = rng.randint(gene_start, gene_end)
            if paired:
                x, y = mk_pair(name, a.seq, a.qual, b.seq, b.qual, 0, p1,
                               p1 + rl + 50, extra_flag=fl, tags=tags)
                aligned[0].extend([x, y])
            else:
                aligned[0].append(BamRecord(name, fl, 0, p1, 60, [(rl, M)],
                                            -1, -1, 0, a.seq, a.qual,
                                            dict(tags)))
        else:
            # missing quals / N-heavy read, aligned in-region
            a, _ = next_sim()
            seq = a.seq
            if rng.random() < 0.5:
                seq = "".join(c if rng.random() > 0.15 else "N" for c in seq)
            p1 = rng.randint(gene_start, gene_end)
            aligned[0].append(BamRecord(name, 0x0 if not paired else 0x41,
                                        0, p1, 60, [(len(seq), M)], -1, -1,
                                        0, seq, None, dict(tags)))

    for tid in aligned:
        aligned[tid].sort(key=lambda r: r.pos)
    bam = f"{OUT}/case_{seed}.bam"
    w = BamWriter(bam, refs, reflens, "@HD\tVN:1.6\tSO:coordinate\n")
    for tid in (0, 1, 2):
        for r in aligned[tid]:
            w.write(r)
    for r in unmapped:
        w.write(r)
    w.close()
    return bam, coord, paired


def run_case(seed):
    bam, coord, paired = gen_case(seed)
    refp = f"{OUT}/ref_{seed}"
    minep = f"{OUT}/mine_{seed}"
    frng = random.Random(seed ^ 0xBC)
    use_bc = frng.random() < 0.4
    use_umi = frng.random() < 0.3
    cmd = [REF_BIN, "-f", coord, "-b", bam, "-o", refp]
    if use_bc:
        cmd += ["--barcode", "CB"]
    if use_umi:
        cmd += ["--UMI", "UB"]
    r = subprocess.run(cmd, capture_output=True)
    if r.returncode != 0:
        return "refcrash"
    try:
        extract_from_bam(bam, coord, coord, minep,
                         bc_field="CB" if use_bc else "",
                         umi_field="UB" if use_umi else "")
    except Exception as e:
        print(f"seed {seed}: OUR EXCEPTION {type(e).__name__}: {e}")
        return "fail"
    suffixes = ["_1.fq", "_2.fq"] if paired else [".fq"]
    if use_bc:
        suffixes.append("_bc.fa")
    if use_umi:
        suffixes.append("_umi.fa")
    ok = True
    for suf in suffixes:
        ra, rb = refp + suf, minep + suf
        ea, eb = os.path.exists(ra), os.path.exists(rb)
        if ea != eb:
            print(f"seed {seed}: existence mismatch {suf} ref={ea} mine={eb}")
            ok = False
            continue
        if not ea:
            continue
        if open(ra, "rb").read() != open(rb, "rb").read():
            print(f"seed {seed}: DIFF {suf}")
            ok = False
    # cleanup on success
    if ok:
        for f in os.listdir(OUT):
            if f"_{seed}" in f or f == f"case_{seed}.bam":
                os.unlink(os.path.join(OUT, f))
    return "ok" if ok else "fail"


if __name__ == "__main__":
    start, n = int(sys.argv[1]), int(sys.argv[2])
    stats = {"ok": 0, "fail": 0, "refcrash": 0}
    for seed in range(start, start + n):
        stats[run_case(seed)] += 1
    print(stats)
