"""Round benchmark: full genotyper-stage throughput vs the reference.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": R}

Workload: the HLA-scale end-to-end benchmark (benchmarks/hla_scale.py —
24 genes x 250 alleles, 12,000 read pairs, 100bp).  The metric is the
BASELINE.md north star — candidate reads aligned per second per chip
for the FULL genotyper stage (extraction-to-genotype of pre-extracted
candidates): read ingest, unique-read dedupe, seed/chain/banded-DP
assignment, mate pairing, coalescing, EC construction, EM, selection
and outputs, on the production default backend (auto: bit-exact native
engine for the assignment state machine on this relay-attached rig —
see docs/tpu_pipeline.md — device EM/prefilter where they win).

Baseline = the reference T1K `genotyper` binary on the SAME input,
single thread both sides (built once from /root/reference into
/tmp/t1k-ref-bench).  Outputs are byte-compared before reporting; a
mismatch invalidates the run.  vs_baseline is the wall-clock ratio
reference/ours — higher is better.
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


def main():
    # Generate the benchmark inputs (cached in /tmp/hlabench).
    env = dict(os.environ)
    subprocess.run([sys.executable,
                    os.path.join(ROOT, "benchmarks", "hla_scale.py"),
                    "none"], check=True, capture_output=True, env=env)
    OUT = "/tmp/hlabench"
    panel, fq1, fq2 = f"{OUT}/panel.fa", f"{OUT}/r_1.fq", f"{OUT}/r_2.fq"

    # --- ours, production default backend, single thread
    from t1k_tpu.cli.genotype import main as gmain
    from t1k_tpu.core.pipeline import resolve_backend

    resolve_backend("auto")  # probe the chip outside the timed region
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

    n_reads = 24000  # 12k pairs, both mates aligned
    print(json.dumps({
        "metric": "genotyper_stage_reads_per_s",
        "value": round(n_reads / ours, 1),
        "unit": "candidate reads aligned/s/chip (full stage, "
                "byte-identical to reference)",
        "vs_baseline": round(ref / ours, 3),
    }))


if __name__ == "__main__":
    main()
