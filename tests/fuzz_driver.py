"""Randomized driver-chain fuzz: run the reference `run-t1k` Perl driver
and `cli.run` over random flag combinations — presets, IO modes
(paired/single/interleaved), --noExtraction/--skipPostAnalysis,
prefix inference, --od, --outputReadAssignment, --post-varMaxGroup, and
--stage restarts — and byte-compare every produced output file.

Exercises the driver ROUTING layer (run-t1k:101-451) on top of the
binaries: stage gating, per-binary arg tables, preset flag macros,
candidate-file discovery, and single/paired detection from extractor
output.

Not collected by pytest (no test_ prefix) — run manually:
  python tests/fuzz_driver.py <start_seed> <n_cases>
Requires the reference binaries + run-t1k in T1K_REFERENCE_BIN
(default /tmp/t1k-ref); build with:
  cp -r /root/reference /tmp/t1k-ref-src && make -C /tmp/t1k-ref-src
  mkdir -p /tmp/t1k-ref && cp /tmp/t1k-ref-src/{genotyper,analyzer,\
fastq-extractor,bam-extractor,run-t1k} /tmp/t1k-ref/
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
OUT = "/tmp/driverfuzz"

# ours-only provenance/observability extras, excluded from comparison
EXTRA_SUFFIXES = ("_config.json", "_metrics.json", "_em_state.npz")


def _outputs(d):
    """prefix-relative -> absolute path of comparable files under d."""
    out = {}
    for name in sorted(os.listdir(d)):
        if any(name.endswith(s) for s in EXTRA_SUFFIXES):
            continue
        out[name] = os.path.join(d, name)
    return out


def _identical(pa, pb, name):
    with open(pa, "rb") as f:
        a = f.read()
    with open(pb, "rb") as f:
        b = f.read()
    if name.endswith("_assign.tsv"):
        # assignment dump order is thread-dependent in the reference
        return sorted(a.splitlines()) == sorted(b.splitlines())
    return a == b


def compare_dirs(refdir, minedir, tag):
    ref, mine = _outputs(refdir), _outputs(minedir)
    ok = True
    if set(ref) != set(mine):
        print(f"  {tag}: file sets differ: only-ref={sorted(set(ref)-set(mine))} "
              f"only-mine={sorted(set(mine)-set(ref))}")
        ok = False
    for name in sorted(set(ref) & set(mine)):
        if not _identical(ref[name], mine[name], name):
            print(f"  {tag}: DIFF {name}")
            ok = False
    return ok


def _run_bam_case(seed, rng, case, panel, records, r1, r2, args):
    """Full -b chain: coordinate-sorted BAM -> bam-extractor ->
    genotyper -> analyzer through both drivers (run-t1k:350)."""
    from t1k_tpu.constants import revcomp_str
    from t1k_tpu.io.bam import BamRecord, BamWriter

    gene_start = rng.randint(5000, 20000)
    gene_end = gene_start + rng.randint(800, 2500)
    coord = f"{case}/coord.fa"
    with open(coord, "w") as f:
        for name, seq, _ in records:
            f.write(f">{name} chr22 {gene_start} {gene_end} +\n{seq}\n")

    paired = rng.random() < 0.7
    bam = f"{case}/in.bam"
    w = BamWriter(bam, ["chr22"], [10_000_000],
                  "@HD\tVN:1.6\tSO:coordinate\n")
    M = 0
    aligned = []
    unmapped = []
    for i, (a, b) in enumerate(zip(r1, r2)):
        kind = rng.random()
        if kind < 0.5:
            # candidate: unaligned template (mates adjacent)
            f1 = 0x1 | 0x4 | 0x8 | 0x40
            f2 = 0x1 | 0x4 | 0x8 | 0x80
            if not paired:
                unmapped.append(BamRecord(a.id, 0x4, -1, -1, 0, [], -1, -1,
                                          0, a.seq, a.qual, {}))
            else:
                unmapped.append(BamRecord(a.id, f1, -1, -1, 0, [], -1, -1,
                                          0, a.seq, a.qual, {}))
                unmapped.append(BamRecord(a.id, f2, -1, -1, 0, [], -1, -1,
                                          0, b.seq, b.qual, {}))
        else:
            # aligned read in or out of the gene interval
            inside = rng.random() < 0.5
            p1 = (rng.randint(gene_start - 30, gene_end - 10) if inside
                  else rng.randint(100000, 9_000_000))
            flag = 0x0 if not paired else (0x1 | 0x2 | 0x20 | 0x40)
            aligned.append(BamRecord(
                a.id, flag, 0, p1, 60, [(len(a.seq), M)], 0,
                p1 + 200, 200 + len(b.seq), a.seq, a.qual, {}))
            if paired:
                aligned.append(BamRecord(
                    a.id, 0x1 | 0x2 | 0x10 | 0x80, 0, p1 + 200, 60,
                    [(len(b.seq), M)], 0, p1,
                    -(200 + len(b.seq)), revcomp_str(b.seq),
                    (b.qual or "")[::-1], {}))
    aligned.sort(key=lambda r: r.pos)
    for r in aligned:
        w.write(r)
    for r in unmapped:
        w.write(r)
    w.close()

    if rng.random() < 0.5:
        args = args + ["-s", rng.choice(["0.8", "0.9"])]
    if rng.random() < 0.3:
        args = args + ["--skipPostAnalysis"]

    refdir, minedir = f"{case}/ref", f"{case}/mine"
    os.makedirs(refdir)
    os.makedirs(minedir)
    cmd = (["perl", os.path.join(REF_DIR, "run-t1k"), "-f", panel,
            "-c", coord, "-b", bam, "-o", "fz", "--od", refdir] + args)
    r = subprocess.run(cmd, capture_output=True)
    from t1k_tpu.cli.run import main as rmain
    if r.returncode != 0:
        try:
            rc = rmain(["-f", panel, "-c", coord, "-b", bam, "-o", "fz",
                        "--od", minedir] + args)
        except Exception:
            rc = 1
        if rc == 0:
            print(f"seed {seed}: reference -b driver died but ours "
                  f"succeeded (args={args})")
            return "fail"
        shutil.rmtree(case, ignore_errors=True)
        return "refcrash"
    rc = rmain(["-f", panel, "-c", coord, "-b", bam, "-o", "fz",
                "--od", minedir] + args)
    if rc != 0:
        print(f"seed {seed}: our -b rc={rc} (args={args})")
        return "fail"
    ok = compare_dirs(refdir, minedir,
                      f"seed {seed} bam (paired={paired} args={args})")
    if ok:
        shutil.rmtree(case, ignore_errors=True)
    return "ok" if ok else "fail"


def run_case(seed):
    rng = random.Random(seed)
    os.makedirs(OUT, exist_ok=True)
    case = f"{OUT}/case_{seed}"
    shutil.rmtree(case, ignore_errors=True)
    os.makedirs(case)

    dna = rng.random() < 0.4
    panel = f"{case}/panel.fa"
    records = make_panel(rng, panel, dna)

    genes = sorted({r[0].split("*")[0] for r in records})
    by_gene = {g: [r for r in records if r[0].startswith(g + "*")]
               for g in genes}
    chosen, abund = [], []
    for g in genes:
        for r in rng.sample(by_gene[g],
                            min(len(by_gene[g]), rng.randint(1, 2))):
            chosen.append(SeqRecord(r[0], r[1], None, r[2]))
            abund.append(rng.uniform(0.4, 1.0))
    cfg = SimConfig(n_pairs=rng.randint(60, 250), seed=seed,
                    read_len=rng.choice([75, 100]),
                    error_rate=rng.choice([0.0, 0.005, 0.02]))
    r1, r2 = simulate_pairs(chosen, abund, cfg)

    io_mode = rng.choices(["paired", "single", "interleaved", "bam"],
                          weights=[0.45, 0.22, 0.18, 0.15])[0]
    if io_mode == "bam":
        return _run_bam_case(seed, rng, case, panel, records, r1, r2, args=[])
    # input files named with dots to exercise prefix inference
    p1 = f"{case}/reads.x_1.fq"
    p2 = f"{case}/reads.x_2.fq"
    pi = f"{case}/reads.inter.fq"
    if io_mode == "interleaved":
        inter = [x for pair in zip(r1, r2) for x in pair]
        write_fastq(pi, inter)
        io_args = ["-i", pi]
    elif io_mode == "paired":
        write_fastq(p1, r1)
        write_fastq(p2, r2)
        io_args = ["-1", p1, "-2", p2]
    else:
        write_fastq(p1, r1)
        io_args = ["-u", p1]

    # barcode chain: extractor correction -> genotyper _candidate_bc.fa
    # -> analyzer _aligned_bc.fa -> _barcode_expr.tsv (run-t1k:195-234)
    if io_mode != "interleaved" and rng.random() < 0.3:
        bc_len = rng.choice([8, 12])
        bcs = [SeqRecord(a.id, "".join(rng.choice("ACGT")
                                       for _ in range(bc_len)),
                         "I" * bc_len, None) for a in r1]
        bf = f"{case}/bc.fq"
        write_fastq(bf, bcs)
        io_args += ["--barcode", bf]
        if rng.random() < 0.5:
            io_args += ["--barcodeRange", "1", str(bc_len - 2),
                        rng.choice(["+", "-"])]
        if rng.random() < 0.5:
            wl = sorted({b.seq for b in bcs})[::2]
            with open(f"{case}/wl.txt", "w") as f:
                f.write("\n".join(wl) + "\n")
            io_args += ["--barcodeWhitelist", f"{case}/wl.txt"]

    args = []
    if dna:
        preset = rng.choice(["", "kir-wgs", "kir-wes"])
    else:
        preset = rng.choice(["", "hla", "hla-wgs"])
    if preset:
        args += ["--preset", preset]
    elif rng.random() < 0.5:
        args += ["-s", rng.choice(["0.8", "0.9"] if dna else ["0.8", "0.97"])]
        if dna and rng.random() < 0.5:
            args += ["--relaxIntronAlign"]
    if rng.random() < 0.25:
        args += ["--frac", rng.choice(["0.05", "0.3"])]
    if rng.random() < 0.25:
        args += ["--cov", rng.choice(["0.5", "2.0"])]
    if rng.random() < 0.2:
        args += ["--crossGeneRate", rng.choice(["0.0", "0.1"])]
    if rng.random() < 0.2:
        args += ["-n", rng.choice(["20", "500"])]
    if rng.random() < 0.3:
        args += ["--outputReadAssignment"]
    skip_post = rng.random() < 0.25
    if skip_post:
        args += ["--skipPostAnalysis"]
    elif rng.random() < 0.3:
        args += ["--post-varMaxGroup", rng.choice(["-1", "2", "8"])]
    no_extract = io_mode != "interleaved" and rng.random() < 0.25
    if no_extract:
        args += ["--noExtraction"]

    use_prefix = rng.random() < 0.7
    prefix_args = ["-o", "fz"] if use_prefix else []

    refdir, minedir = f"{case}/ref", f"{case}/mine"
    os.makedirs(refdir)
    os.makedirs(minedir)

    cmd = (["perl", os.path.join(REF_DIR, "run-t1k"), "-f", panel]
           + io_args + prefix_args + ["--od", refdir] + args)
    r = subprocess.run(cmd, capture_output=True)

    from t1k_tpu.cli.run import main as rmain

    if r.returncode != 0:
        # the reference driver dies (e.g. no candidates survive the
        # whitelist); ours must also fail rather than fabricate output
        try:
            rc = rmain(["-f", panel] + io_args + prefix_args
                       + ["--od", minedir] + args)
        except SystemExit as e:
            rc = int(e.code or 0)
        except Exception:
            rc = 1
        if rc == 0:
            print(f"seed {seed}: reference driver died but ours "
                  f"succeeded (mode={io_mode} args={args})")
            return "fail"
        shutil.rmtree(case, ignore_errors=True)
        return "refcrash"

    rc = rmain(["-f", panel] + io_args + prefix_args + ["--od", minedir]
               + args)
    if rc != 0:
        print(f"seed {seed}: our rc={rc} (mode={io_mode} args={args})")
        return "fail"

    ok = compare_dirs(refdir, minedir, f"seed {seed} full "
                      f"(mode={io_mode} preset={preset!r} args={args})")

    # stage-restart check: re-run a later stage in place on both sides;
    # outputs must be rewritten identically from the stage files
    if ok and not no_extract and rng.random() < 0.35:
        stage = rng.choice([1, 2] if not skip_post else [1])
        cmd2 = (["perl", os.path.join(REF_DIR, "run-t1k"), "-f", panel]
                + io_args + prefix_args
                + ["--od", refdir, "--stage", str(stage)] + args)
        r = subprocess.run(cmd2, capture_output=True)
        if r.returncode != 0:
            shutil.rmtree(case, ignore_errors=True)
            return "refcrash"
        rc = rmain(["-f", panel] + io_args + prefix_args
                   + ["--od", minedir, "--stage", str(stage)] + args)
        if rc != 0:
            print(f"seed {seed}: stage {stage} rc={rc}")
            return "fail"
        ok = compare_dirs(refdir, minedir,
                          f"seed {seed} stage{stage} (mode={io_mode})")

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
