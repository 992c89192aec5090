"""Randomized cohort-tool parity fuzz: generate random genotype.tsv
cohorts and byte-compare stdout of t1k-merge.py / t1k-copynumber.py /
scripts/GroupSample.py against tools.merge / tools.copynumber /
tools.group_samples over random flags.

Covers the parsing/formatting quirks of the reference scripts: float
repr output, comma-separated equal-allele lists (only the first votes,
any matches the matrix), trailing "_genotype" stripping, stable
sort-by-vote ties, quantile edge cases in the copy-number fit.

Not collected by pytest (no test_ prefix) — run manually:
  python tests/fuzz_tools.py <start_seed> <n_cases>
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
OUT = "/tmp/toolsfuzz"

GENES = ["HLA-A", "HLA-B", "HLA-C", "KIR2DL1", "KIR3DL2", "GENX"]


def _allele(rng, gene):
    parts = [f"{rng.randint(1, 99):02d}"
             for _ in range(rng.randint(1, 4))]
    return f"{gene}*" + ":".join(parts)


def _allele_field(rng, gene):
    n = 1 if rng.random() < 0.8 else rng.randint(2, 3)
    return ",".join(_allele(rng, gene) for _ in range(n))


def _abund(rng):
    v = rng.choice([
        round(rng.uniform(0, 120), rng.randint(0, 4)),
        float(rng.randint(0, 100)),
        0.0,
    ])
    return repr(v)


def make_genotype(rng, path, genes):
    rows = []
    for gene in genes:
        n = rng.choices([0, 1, 2], weights=[0.2, 0.3, 0.5])[0]
        f1 = _allele_field(rng, gene) if n >= 1 else "."
        f2 = _allele_field(rng, gene) if n >= 2 else "."
        if n == 2 and rng.random() < 0.2:
            f2 = f1  # homozygous reported with the same allele twice
        q1 = rng.randint(-1, 60) if n >= 1 else -1
        q2 = rng.randint(-1, 60) if n >= 2 else -1
        a1 = _abund(rng) if n >= 1 else "0"
        a2 = _abund(rng) if n >= 2 else "0"
        secondary = ""
        if rng.random() < 0.3:
            secondary = ";".join(
                f"{_allele(rng, gene)};{_abund(rng)};{rng.randint(0, 60)}"
                for _ in range(rng.randint(1, 2)))
        rows.append(f"{gene}\t{n}\t{f1}\t{a1}\t{q1}\t{f2}\t{a2}\t{q2}"
                    f"\t{secondary}")
    with open(path, "w") as f:
        f.write("\n".join(rows) + "\n")


def _ref(script, args):
    return subprocess.run(
        [sys.executable, os.path.join(REF_SRC, script)] + args,
        capture_output=True, text=True)



REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _mine(module, args):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    return subprocess.run(
        [sys.executable, "-m", module] + args,
        capture_output=True, text=True, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

def run_case(seed):
    rng = random.Random(seed)
    case = f"{OUT}/case_{seed}"
    shutil.rmtree(case, ignore_errors=True)
    os.makedirs(case)

    n_samples = rng.randint(1, 8)
    genes = rng.sample(GENES, rng.randint(1, len(GENES)))
    if rng.random() < 0.7:
        for g in ("HLA-A", "HLA-B", "HLA-C"):
            if g not in genes:
                genes.append(g)
    files = []
    for s in range(n_samples):
        name = rng.choice([f"s{s}_genotype.tsv", f"cell.{s}.tsv",
                           f"x{s}.genotype.tsv"])
        path = os.path.join(case, name)
        make_genotype(rng, path, genes)
        files.append(path)
    filelist = os.path.join(case, "list.txt")
    with open(filelist, "w") as f:
        f.write("\n".join(files) + "\n")

    failures = []

    # ---- merge ----
    margs = ["-l", filelist]
    if rng.random() < 0.5:
        margs += ["-n", str(rng.choice([1, 2, 3]))]
    if rng.random() < 0.5:
        margs += ["-q", str(rng.choice([0, 10, 40]))]
    if rng.random() < 0.5:
        margs += ["--tq", str(rng.choice([0, 30, 100]))]
    r = _ref("t1k-merge.py", margs)
    if r.returncode == 0:
        m = _mine("t1k_tpu.tools.merge", margs)
        if m.returncode != 0 or m.stdout != r.stdout:
            failures.append(("merge", margs))

    # ---- group samples ----
    gargs = ["-l", filelist]
    if rng.random() < 0.5:
        gargs += ["-q", str(rng.choice([0, 29, 50]))]
    if rng.random() < 0.5:
        gargs += ["-d", str(rng.choice([1, 2, 3]))]
    r = _ref("scripts/GroupSample.py", gargs)
    if r.returncode == 0:
        m = _mine("t1k_tpu.tools.group_samples", gargs)
        if m.returncode != 0 or m.stdout != r.stdout:
            failures.append(("group", gargs))

    # ---- copy number (per sample file) ----
    cargs = []
    if rng.random() < 0.5:
        cargs += ["--upper-quantile", str(rng.choice([0.3, 0.5, 1.0]))]
    if rng.random() < 0.3:
        cargs += ["--lower-quantile", str(rng.choice([0.0, 0.2]))]
    if rng.random() < 0.3:
        cargs += ["--adjust-var", str(rng.choice([0.5, 1.0, 2.0]))]
    if rng.random() < 0.3:
        cargs += ["-q", str(rng.choice([0, 20]))]
    if rng.random() < 0.3:
        cargs += ["--nomissing",
                  ",".join(rng.sample(genes, rng.randint(1, 2)))]
    for path in files[:2]:
        a = ["-g", path] + cargs
        r = _ref("t1k-copynumber.py", a)
        if r.returncode != 0:
            continue
        m = _mine("t1k_tpu.tools.copynumber", a)
        if m.returncode != 0 or m.stdout != r.stdout:
            failures.append(("copynumber", a))

    if failures:
        for f in failures:
            print(f"seed {seed}: DIFF {f}")
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
