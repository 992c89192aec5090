"""Round benchmark: full genotyper-stage throughput vs the reference,
PLUS device-executed metrics for the TPU kernels.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": R,
   "device": "tpu" | "unreachable",
   "device_metrics": {...}}

Headline workload: the HLA-scale end-to-end benchmark
(benchmarks/hla_scale.py — 24 genes x 250 alleles, 12,000 read pairs,
100bp).  The metric is the BASELINE.md north star — candidate reads
aligned per second per chip for the FULL genotyper stage (read ingest,
unique-read dedupe, seed/chain/banded-DP assignment, mate pairing,
coalescing, EC construction, EM, selection and outputs) on the
production default backend.  Baseline = the reference T1K `genotyper`
binary on the SAME input, single thread both sides; outputs are
byte-compared before reporting.

Device metrics (the round must never ship without device evidence —
VERDICT r3): each microbenchmark runs in its OWN subprocess with its
own timeout, so one wedged kernel compile cannot black out the others:

  band_kernel   benchmarks/aligner_kernel.py  sustained DP pairs/s/chip
  device_em     benchmarks/em_iters.py        SQUAREM rounds/s on device
  device_screen benchmarks/kmer_screen.py     extraction-screen reads/s

The chip probe itself (core/pipeline.py tpu_present) retries once with
a doubled timeout; if the device is unreachable the line carries an
explicit machine-readable marker instead of silently reporting CPU-only
numbers as the round's record.
"""

import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, ROOT)

REF_SRC = "/root/reference"
REF_BIN = os.environ.get("T1K_REFERENCE_BIN", "/tmp/t1k-ref-bench")

# per-subprocess budget for one device microbenchmark (first-call kernel
# compiles through the relay have been observed at 48-400s)
DEV_TIMEOUT_S = float(os.environ.get("T1K_DEVICE_BENCH_TIMEOUT_S", "600"))


def ensure_reference() -> str:
    """Build the reference binaries once; returns the genotyper path."""
    geno = os.path.join(REF_BIN, "genotyper")
    if os.path.exists(geno):
        return geno
    import shutil

    shutil.copytree(REF_SRC, REF_BIN, dirs_exist_ok=True)
    subprocess.run(["make", "-j8"], cwd=REF_BIN, check=True,
                   capture_output=True)
    return geno


def run_device_bench(script: str, args=()):
    """One device microbenchmark in its own subprocess + timeout.

    Returns the benchmark's parsed JSON line(s), or a machine-readable
    {"status": "timeout"|"error", ...} marker — never raises."""
    cmd = [sys.executable, os.path.join(ROOT, "benchmarks", script)] + list(args)
    env = dict(os.environ)
    env["PYTHONPATH"] = ROOT + os.pathsep + env.get("PYTHONPATH", "")
    try:
        p = subprocess.run(cmd, timeout=DEV_TIMEOUT_S, capture_output=True,
                           text=True, env=env)
    except subprocess.TimeoutExpired:
        return {"status": "timeout", "timeout_s": DEV_TIMEOUT_S}
    lines = []
    for ln in p.stdout.splitlines():
        ln = ln.strip()
        if ln.startswith("{"):
            try:
                lines.append(json.loads(ln))
            except json.JSONDecodeError:
                pass
    if p.returncode != 0 or not lines:
        return {"status": "error", "rc": p.returncode,
                "stderr_tail": p.stderr[-400:]}
    return lines[0] if len(lines) == 1 else lines


def main():
    # Generate the benchmark inputs (cached in /tmp/hlabench).
    env = dict(os.environ)
    subprocess.run([sys.executable,
                    os.path.join(ROOT, "benchmarks", "hla_scale.py"),
                    "none"], check=True, capture_output=True, env=env)
    OUT = "/tmp/hlabench"
    panel, fq1, fq2 = f"{OUT}/panel.fa", f"{OUT}/r_1.fq", f"{OUT}/r_2.fq"

    # --- probe the chip once, outside every timed region (both gates:
    # presence for the bulk stages, locality for the DP offload; the
    # verdicts cache into the environment)
    from t1k_tpu.core.pipeline import resolve_backend, tpu_present

    device = "tpu" if tpu_present() else "unreachable"
    resolve_backend("auto")

    # --- ours, production default backend, single thread
    from t1k_tpu.cli.genotype import main as gmain

    t0 = time.perf_counter()
    rc = gmain(["-f", panel, "-1", fq1, "-2", fq2, "-o", f"{OUT}/bench_mine",
                "-t", "1"])
    ours = time.perf_counter() - t0
    assert rc == 0

    # --- reference binary, same input, single thread
    geno = ensure_reference()
    t0 = time.perf_counter()
    subprocess.run([geno, "-f", panel, "-1", fq1, "-2", fq2,
                    "-o", f"{OUT}/bench_ref", "-t", "1"],
                   check=True, capture_output=True)
    ref = time.perf_counter() - t0

    # validity: byte-identical calls
    for suf in ("_genotype.tsv", "_allele.tsv"):
        a = open(f"{OUT}/bench_mine{suf}").read()
        b = open(f"{OUT}/bench_ref{suf}").read()
        assert a == b, f"output mismatch vs reference: {suf}"

    # --- device-executed metrics, each in its own subprocess + timeout
    device_metrics = {}
    if device == "tpu":
        device_metrics["band_kernel"] = run_device_bench("aligner_kernel.py")
        device_metrics["device_em"] = run_device_bench("em_iters.py")
        device_metrics["device_screen"] = run_device_bench("kmer_screen.py")
        device_metrics["sharded_em"] = run_device_bench("sharded_em.py")
        device_metrics["cohort_em"] = run_device_bench("cohort_em.py",
                                                       ["2048"])
    else:
        device_metrics["status"] = "device unreachable; no TPU metrics"

    n_reads = 24000  # 12k pairs, both mates aligned
    print(json.dumps({
        "metric": "genotyper_stage_reads_per_s",
        "value": round(n_reads / ours, 1),
        "unit": "candidate reads aligned/s/chip (full stage, "
                "byte-identical to reference)",
        "vs_baseline": round(ref / ours, 3),
        "device": device,
        "device_metrics": device_metrics,
    }))


if __name__ == "__main__":
    main()
