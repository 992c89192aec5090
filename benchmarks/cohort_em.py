"""Cohort-batched device EM benchmark: cells as a batched axis.

Quantifies C independent cells' EC problems (a) one cell at a time with
the single-sample device EM and (b) stacked into one batched device
program (ops/em.py em_quantify_jax_batched — the SMART-seq --cohortEm
second pass).  The batched path amortizes dispatch and keeps the HBM
pipeline full; prints cells/s for both.

Usage: python benchmarks/cohort_em.py [n_cells] [rg_per_cell] [ec_per_cell]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def make_problem(seed, n_alleles, K, G):
    r = np.random.default_rng(seed)
    pool = list(range(n_alleles))
    r.shuffle(pool)
    ecs, used = [], 0
    for _ in range(K):
        sz = int(r.integers(1, 4))
        ecs.append(sorted(pool[used:used + sz]))
        used = (used + sz) % (n_alleles - 4)
    rg_off, rg_ecs = [0], []
    for _ in range(G):
        n = int(r.integers(1, 5))
        rg_ecs.extend(sorted(r.choice(K, n, replace=False).tolist()))
        rg_off.append(len(rg_ecs))
    counts = r.integers(1, 20, G).astype(np.float64)
    return (ecs, (np.array(rg_off), np.array(rg_ecs)), counts,
            np.ones(n_alleles))


def main():
    n_cells = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    G = int(sys.argv[2]) if len(sys.argv) > 2 else 600
    K = int(sys.argv[3]) if len(sys.argv) > 3 else 48

    from t1k_tpu.ops.em import em_quantify_jax, em_quantify_jax_batched

    n_alleles, n_genes = 160, 16
    allele_gene = (np.arange(n_alleles) % n_genes).astype(np.int32)
    allele_major = (np.arange(n_alleles) // 2).astype(np.int32)
    n_majors = n_alleles // 2
    rng = np.random.default_rng(1)
    eff_len = rng.integers(800, 1600, n_alleles).astype(np.float64)
    missing = np.zeros(n_alleles)

    problems = [make_problem(1000 + i, n_alleles, K, G)
                for i in range(n_cells)]

    # warm both jit caches
    em_quantify_jax(*problems[0][:3], eff_len, missing, problems[0][3],
                    allele_gene, allele_major, n_genes, n_majors)
    em_quantify_jax_batched(problems[:2], eff_len, allele_gene, allele_major,
                            n_genes, n_majors)

    # per-cell rate on a subsample (serial dispatch makes the full
    # cohort prohibitive — which is the point of the batched path)
    sub = problems[:min(n_cells, 128)]
    t0 = time.perf_counter()
    for p in sub:
        em_quantify_jax(p[0], p[1], p[2], eff_len, missing, p[3],
                        allele_gene, allele_major, n_genes, n_majors)
    t_seq = time.perf_counter() - t0
    seq_rate = len(sub) / t_seq

    t0 = time.perf_counter()
    em_quantify_jax_batched(problems, eff_len, allele_gene, allele_major,
                            n_genes, n_majors)
    t_bat = time.perf_counter() - t0
    bat_rate = n_cells / t_bat

    from t1k_tpu.ops.em import BATCH_EM_MAX_ELEMS
    n_chunks = -(-n_cells * G * K // BATCH_EM_MAX_ELEMS)
    import json
    print(json.dumps({
        "metric": "cohort_em_cells_per_s",
        "n_cells": n_cells, "rg_per_cell": G, "ec_per_cell": K,
        "approx_chunks": n_chunks,
        "value": round(bat_rate, 1),
        "per_cell_dispatch_cells_per_s": round(seq_rate, 1),
        "batched_vs_per_cell": round(bat_rate / seq_rate, 2),
        "batched_wall_s": round(t_bat, 2),
    }))


if __name__ == "__main__":
    main()
