"""Randomized SMART-seq chain fuzz: run the reference t1k-smartseq.pl
two-pass pipeline (per-cell run-t1k -> merge -> reduced reference ->
re-genotype --noExtraction -> final merge) and tools.smartseq on the
same random cohorts, byte-comparing the final/merged matrices, the
reduced reference, and every per-cell genotype output.

Exercises the reduced-reference selection quirk (allele names are
matched as escaped-* REGEXES against full header lines, so a selected
2-digit allele also pulls in every extension of it,
t1k-smartseq.pl:129-156) and per-cell prefix derivation from the part
of the filename before the first dot.

Not collected by pytest (no test_ prefix) — run manually:
  python tests/fuzz_smartseq.py <start_seed> <n_cases>
Requires the reference binaries + run-t1k + t1k-smartseq.pl +
t1k-merge.py staged in T1K_REFERENCE_BIN (default /tmp/t1k-ref) with
run-t1k executable.
"""

import os
import random
import shutil
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from t1k_tpu.io.reads import SeqRecord, write_fastq  # noqa: E402
from t1k_tpu.tools.simulate import SimConfig, simulate_pairs  # noqa: E402
from tests.fuzz_genotyper import make_panel  # noqa: E402

REF_DIR = os.environ.get("T1K_REFERENCE_BIN", "/tmp/t1k-ref")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = "/tmp/smartseqfuzz"


def _collect(d):
    """relative path -> bytes of every comparable output under d."""
    out = {}
    for root, _, names in os.walk(d):
        for name in names:
            if name.endswith(("_config.json", "_metrics.json",
                              "_em_state.npz")):
                continue
            p = os.path.join(root, name)
            rel = os.path.relpath(p, d)
            with open(p, "rb") as f:
                out[rel] = f.read()
    return out


def run_case(seed):
    rng = random.Random(seed)
    case = f"{OUT}/case_{seed}"
    shutil.rmtree(case, ignore_errors=True)
    os.makedirs(case)

    panel = f"{case}/panel.fa"
    records = make_panel(rng, panel, dna=False)
    genes = sorted({r[0].split("*")[0] for r in records})
    by_gene = {g: [r for r in records if r[0].startswith(g + "*")]
               for g in genes}

    paired = rng.random() < 0.7
    n_cells = rng.randint(2, 4)
    reads_dir = f"{case}/reads"
    os.makedirs(reads_dir)
    l1, l2 = [], []
    for c in range(n_cells):
        chosen, abund = [], []
        for g in genes:
            for r in rng.sample(by_gene[g],
                                min(len(by_gene[g]), rng.randint(1, 2))):
                chosen.append(SeqRecord(r[0], r[1], None, r[2]))
                abund.append(rng.uniform(0.4, 1.0))
        cfg = SimConfig(n_pairs=rng.randint(60, 150), seed=seed * 100 + c,
                        read_len=rng.choice([75, 100]),
                        error_rate=rng.choice([0.0, 0.01]))
        r1, r2 = simulate_pairs(chosen, abund, cfg)
        f1 = f"{reads_dir}/cell{c}.x_1.fq"
        f2 = f"{reads_dir}/cell{c}.x_2.fq"
        write_fastq(f1, r1)
        l1.append(f1)
        if paired:
            write_fastq(f2, r2)
            l2.append(f2)
    list1, list2 = f"{case}/list1.txt", f"{case}/list2.txt"
    with open(list1, "w") as f:
        f.write("\n".join(l1) + "\n")
    if paired:
        with open(list2, "w") as f:
            f.write("\n".join(l2) + "\n")

    args = []
    if rng.random() < 0.4:
        args += ["--preset", "hla"]

    refdir, minedir = f"{case}/ref", f"{case}/mine"
    os.makedirs(refdir)
    os.makedirs(minedir)

    cmd = (["perl", os.path.join(REF_DIR, "t1k-smartseq.pl"),
            "-f", panel, "-1", list1]
           + (["-2", list2] if paired else []) + args)
    r = subprocess.run(cmd, capture_output=True, cwd=refdir)
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    if r.returncode != 0:
        # the reference dies on empty merges ("No qualified allele
        # found", t1k-smartseq.pl:138); ours must also fail there
        m = subprocess.run(
            [sys.executable, "-m", "t1k_tpu.tools.smartseq",
             "-f", panel, "-1", list1]
            + (["-2", list2] if paired else []) + args,
            capture_output=True, cwd=minedir, env=env)
        if m.returncode == 0:
            print(f"seed {seed}: reference died "
                  f"({r.stderr.decode().strip().splitlines()[-1:]}) "
                  f"but ours succeeded")
            return "fail"
        shutil.rmtree(case, ignore_errors=True)
        return "refcrash"

    m = subprocess.run(
        [sys.executable, "-m", "t1k_tpu.tools.smartseq",
         "-f", panel, "-1", list1]
        + (["-2", list2] if paired else []) + args,
        capture_output=True, cwd=minedir, env=env)
    if m.returncode != 0:
        print(f"seed {seed}: our rc={m.returncode} "
              f"(paired={paired} args={args})\n{m.stderr.decode()[-400:]}")
        return "fail"

    ref, mine = _collect(refdir), _collect(minedir)
    ok = True
    if set(ref) != set(mine):
        print(f"seed {seed}: file sets differ (paired={paired} args={args}):"
              f" only-ref={sorted(set(ref)-set(mine))[:6]}"
              f" only-mine={sorted(set(mine)-set(ref))[:6]}")
        ok = False
    for name in sorted(set(ref) & set(mine)):
        if ref[name] != mine[name]:
            print(f"seed {seed}: DIFF {name} (paired={paired} args={args})")
            ok = False
    if ok:
        shutil.rmtree(case, ignore_errors=True)
    return "ok" if ok else "fail"


if __name__ == "__main__":
    start, n = int(sys.argv[1]), int(sys.argv[2])
    stats = {"ok": 0, "fail": 0, "refcrash": 0}
    for seed in range(start, start + n):
        stats[run_case(seed)] += 1
        if (seed - start + 1) % 10 == 0:
            print(f"...{seed - start + 1} done: {stats}", flush=True)
    print(stats)
