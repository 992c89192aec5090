"""Round benchmark: banded-aligner throughput on the TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": R}

Workload: the pipeline's hot-loop shape — 112bp reference windows vs
100bp candidate reads (~2% substitutions), banded affine-gap scoring via
the band-packed Pallas kernel (ops/align_pallas_band.py), measured on
device-resident data (the pipeline ships read batches to HBM once and
runs all per-batch kernels there).

Baseline = the reference implementation's per-pair DP throughput,
measured with this framework's native C++ engine, which runs the same
algorithm with identical results (single thread, as the reference
binaries' inner loop does per thread).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np  # noqa: E402


def make_batch(B, Lt=112, Lp=100, seed=1):
    rng = np.random.default_rng(seed)
    tc = rng.integers(0, 4, (B, Lt)).astype(np.int8)
    off = (Lt - Lp) // 2
    pc = tc[:, off:off + Lp].copy()
    mut = rng.random((B, Lp)) < 0.02
    pc[mut] = rng.integers(0, 4, int(mut.sum())).astype(np.int8)
    tl = np.full(B, Lt, np.int32)
    pl = np.full(B, Lp, np.int32)
    return tc, tl, pc, pl


def bench_native_baseline(n=4000):
    from t1k_tpu.native import align_global

    tc, tl, pc, pl = make_batch(n, seed=2)
    t0 = time.perf_counter()
    for i in range(n):
        align_global(tc[i], pc[i])
    dt = time.perf_counter() - t0
    return n / dt


def bench_tpu(B=32768, n_reps=9):
    import jax
    import jax.numpy as jnp

    from t1k_tpu.ops.align_pallas_band import (
        LANES, W, _band_grid, _round_up)

    G = 8
    Lt, Lp = 112, 100
    ML = 5
    P = G * LANES
    nblocks = -(-B // P)
    Lt_pad = _round_up(max(Lt + ML + 1, Lp + W + 1) + 1, 8)
    Lp_pad = _round_up(Lp, 8)
    # Generate the batch ON DEVICE (same distribution as make_batch):
    # this keeps the benchmark robust to relay-bandwidth dips on this
    # rig — only the [B] score vector crosses the link per rep.
    @jax.jit
    def gen(seed):
        k1, k2, k3 = jax.random.split(jax.random.PRNGKey(seed), 3)
        t = jax.random.randint(k1, (B, Lt), 0, 4, jnp.int8)
        off = (Lt - Lp) // 2
        p = t[:, off:off + Lp]
        mut = jax.random.uniform(k2, (B, Lp)) < 0.02
        p = jnp.where(mut, jax.random.randint(k3, (B, Lp), 0, 4, jnp.int8),
                      p)
        return t, p

    tl = jnp.full(B, Lt, jnp.int32)
    pl = jnp.full(B, Lp, jnp.int32)
    base_t, base_p = gen(1)
    jax.block_until_ready((base_t, base_p))

    @jax.jit
    def derive(t, p, v):
        return (t + v) % 4, (p + v) % 4  # distinct content, same structure

    variants = [derive(base_t, base_p, v) for v in range(n_reps + 1)]
    jax.block_until_ready(variants)

    def run(v):
        t, p = variants[v]
        return np.asarray(_band_grid(
            t, tl, p, pl, G, ML, Lp, Lt, Lt_pad, Lp_pad, nblocks))

    run(0)  # compile + warm
    times = []
    for v in range(1, n_reps + 1):
        t0 = time.perf_counter()
        run(v)
        times.append(time.perf_counter() - t0)
    # median rep: robust to transient relay-bandwidth dips on this rig
    times.sort()
    dt = times[len(times) // 2]
    return B / dt


def main():
    baseline = bench_native_baseline()
    tpu = bench_tpu()
    print(json.dumps({
        "metric": "banded_align_pairs_per_s_per_chip",
        "value": round(tpu),
        "unit": "pairs/s",
        "vs_baseline": round(tpu / baseline, 3),
    }))


if __name__ == "__main__":
    main()
