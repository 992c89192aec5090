"""Randomized database-builder parity fuzz: generate random EMBL-ENA
.dat files (multi-gene, partial alleles, short/absent UTRs, pseudo
exons, duplicate sequences) and byte-compare ParseDatFile.pl against
db.parse_dat across --mode rna/dna/genome and the option surface
(--intronPadding, --dedup, --gene, --ignorePartial,
--partialInRnaMode).

Exercises the hairy paths: partial-allele intron rescue with per-gene
modal intron consensus (ParseDatFile.pl:460-573), seeded-random UTR
padding incl. the oversized-padding splice (:575-601), exonization
trimming vs modal exon/intron lengths (:619-704), and gene-modal length
trimming (:721-739).

NOTE the reference's --ignorePartial branch has a stray ++$i that
swallows the following argv token (ParseDatFile.pl:64-67); the fuzz
always passes it as the LAST argument so both sides parse identically.

Not collected by pytest (no test_ prefix) — run manually:
  python tests/fuzz_db.py <start_seed> <n_cases>
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
OUT = "/tmp/dbfuzz"
BASES = "ACGT"


def _rand_seq(rng, n):
    return "".join(rng.choice(BASES) for _ in range(n))


def _mutate(rng, seq, rate):
    out = []
    for c in seq:
        if rng.random() < rate:
            out.append(BASES[(BASES.index(c) + rng.randint(1, 3)) % 4])
        else:
            out.append(c)
    return "".join(out)


def _emit_record(f, allele, seq, features):
    f.write(f"ID   {allele}\n")
    f.write(f'FT   allele="{allele}"\n')
    for line in features:
        f.write(f"FT   {line}\n")
    f.write(f"SQ  Sequence {len(seq)} BP\n")
    for i in range(0, len(seq), 60):
        chunk = seq[i:i + 60]
        f.write(f"{chunk} {min(i + 60, len(seq))}\n")
    f.write("//\n")


def make_dat(rng, path):
    """Genes with exon/intron structure; alleles mutate exons and may be
    partial (missing leading/trailing exon blocks)."""
    n_genes = rng.randint(1, 3)
    with open(path, "w") as f:
        gene_names = []
        for g in range(n_genes):
            gene = f"FZ{chr(65 + g)}"
            gene_names.append(gene)
            n_ex = rng.randint(1, 4)
            utr5 = rng.choice([0, 5, 20, 50, 80])
            utr3 = rng.choice([0, 5, 20, 50, 80])
            ex_lens = [rng.randint(40, 180) for _ in range(n_ex)]
            in_lens = [rng.randint(25, 140) for _ in range(n_ex - 1)]
            exons_t = [_rand_seq(rng, n) for n in ex_lens]
            introns_t = [_rand_seq(rng, n) for n in in_lens]
            n_alleles = rng.randint(2, 7)
            dup_from = None
            for a in range(n_alleles):
                allele = f"{gene}*{a + 1:03d}"
                ex = [_mutate(rng, e, rng.uniform(0.0, 0.02))
                      for e in exons_t]
                ex_introns = list(introns_t)
                # exonized allele: an internal exon annexes a few bases
                # of its flanking intron (exon longer than the gene
                # modal, true intron shorter) — drives ParseDatFile's
                # exonization trimming incl. the left-trim branch
                if n_ex >= 2 and a >= 1 and rng.random() < 0.25:
                    j = rng.randint(1, n_ex - 1)
                    delta = rng.randint(3, min(12, len(ex_introns[j - 1]) - 5))
                    if rng.random() < 0.5:
                        # exon j grows leftward into intron j-1
                        ex[j] = ex_introns[j - 1][-delta:] + ex[j]
                        ex_introns[j - 1] = ex_introns[j - 1][:-delta]
                    else:
                        # exon j-1 grows rightward into intron j-1
                        ex[j - 1] = ex[j - 1] + ex_introns[j - 1][:delta]
                        ex_introns[j - 1] = ex_introns[j - 1][delta:]
                if dup_from is not None and rng.random() < 0.3:
                    ex = dup_from  # duplicate sequence for --dedup
                elif rng.random() < 0.3:
                    dup_from = ex
                # partial allele: drop leading and/or trailing blocks
                lo, hi = 0, n_ex
                partial = rng.random() < 0.3 and n_ex >= 2
                if partial:
                    if rng.random() < 0.7:
                        lo = rng.randint(1, n_ex - 1)
                    if hi - lo > 1 and rng.random() < 0.5:
                        hi = rng.randint(lo + 1, n_ex)
                    if (lo, hi) == (0, n_ex):
                        partial = False
                parts = []
                feats = []
                pos = 1
                pad5 = utr5 if lo == 0 else rng.choice([0, 3, 10])
                if pad5:
                    parts.append(_rand_seq(rng, pad5))
                    pos += pad5
                for i in range(lo, hi):
                    parts.append(ex[i])
                    feats.append(f"exon          {pos}..{pos + len(ex[i]) - 1}")
                    if hi - lo >= 2 and i > lo and rng.random() < 0.08:
                        # a pseudo marker pops the preceding exon's
                        # coordinates (ParseDatFile.pl:185-190); the
                        # sequence keeps the bases
                        feats.append("/pseudo")
                    pos += len(ex[i])
                    if i + 1 < hi:
                        intr = ex_introns[i]
                        parts.append(intr)
                        feats.append(
                            f"intron        {pos}..{pos + len(intr) - 1}")
                        pos += len(intr)
                pad3 = utr3 if hi == n_ex else rng.choice([0, 3, 10])
                if pad3:
                    parts.append(_rand_seq(rng, pad3))
                if partial:
                    feats.append("/partial")
                seq = "".join(parts)
                _emit_record(f, allele, seq, feats)
    return gene_names


def _run_ref(dat, args):
    return subprocess.run(
        ["perl", os.path.join(REF_SRC, "ParseDatFile.pl"), dat] + args,
        capture_output=True, text=True)


REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_mine(dat, args):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    return subprocess.run(
        [sys.executable, "-m", "t1k_tpu.db.parse_dat", dat] + args,
        capture_output=True, text=True, env=env)



def _records(text):
    recs, name, seq = [], None, []
    for line in text.splitlines():
        if line.startswith(">"):
            if name is not None:
                recs.append((name, "".join(seq)))
            name, seq = line, []
        else:
            seq.append(line)
    if name is not None:
        recs.append((name, "".join(seq)))
    return recs


def _benign_order_diff(ref, mine, dedup):
    """The reference appends rescued partial alleles in PERL HASH ORDER
    (ParseDatFile.pl:524 `keys %partialAlleles`, :572) — its own output
    order varies across runs.  Accept order-insensitive record equality;
    under --dedup the surviving NAME of a duplicate group also depends
    on that order, so accept equal sequence multisets + equal counts."""
    a, b = _records(ref), _records(mine)
    if sorted(a) == sorted(b):
        return True
    if dedup and len(a) == len(b):
        return sorted(s for _, s in a) == sorted(s for _, s in b)
    return False


def run_case(seed):
    rng = random.Random(seed)
    case = f"{OUT}/case_{seed}"
    shutil.rmtree(case, ignore_errors=True)
    os.makedirs(case)
    dat = f"{case}/fz.dat"
    genes = make_dat(rng, dat)

    failures = []
    for mode in ("rna", "dna", "genome"):
        args = ["--mode", mode]
        if rng.random() < 0.3:
            args += ["--intronPadding", rng.choice(["50", "100", "300"])]
        if rng.random() < 0.3:
            args += ["--partialInRnaMode", rng.choice(["0", "100", "-1"])]
        if rng.random() < 0.2:
            args += ["--gene", rng.choice(genes)]
        if rng.random() < 0.3:
            args += ["--dedup"]
        if rng.random() < 0.2:
            args += ["--ignorePartial"]  # must stay LAST (see module doc)
        r = _run_ref(dat, args)
        if r.returncode != 0:
            failures.append(("refcrash", mode, args))
            continue
        m = _run_mine(dat, args)
        if m.returncode != 0:
            failures.append(("crash", mode, args, m.stderr[-300:]))
        elif m.stdout != r.stdout and not _benign_order_diff(
                r.stdout, m.stdout, "--dedup" in args):
            failures.append(("diff", mode, args))
    if any(f[0] != "refcrash" for f in failures):
        for f in failures:
            print(f"seed {seed}: {f}")
        return "fail"
    if failures:
        shutil.rmtree(case, ignore_errors=True)
        return "refcrash"
    shutil.rmtree(case, ignore_errors=True)
    return "ok"


if __name__ == "__main__":
    start, n = int(sys.argv[1]), int(sys.argv[2])
    stats = {"ok": 0, "fail": 0, "refcrash": 0}
    for seed in range(start, start + n):
        stats[run_case(seed)] += 1
        if (seed - start + 1) % 20 == 0:
            print(f"...{seed - start + 1} done: {stats}", flush=True)
    print(stats)
