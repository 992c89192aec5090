"""Banded-aligner kernel throughput on the TPU chip (microbenchmark).

Former round-bench workload; bench.py now reports the full-stage
metric and this kernel figure backs the README aligner row.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": R}

Workload: the pipeline's hot-loop shape — 112bp reference windows vs
100bp candidate reads (~2% substitutions), banded affine-gap scoring via
the band-packed Pallas kernel (ops/align_pallas_band.py).

Methodology: the pipeline streams many device-resident batches per
host round-trip (reads ship to HBM once; every per-batch kernel runs
there), so the metric is SUSTAINED throughput: R batches are chained
inside one jitted call with a data dependency between consecutive
batches (batch i+1's inputs are derived from batch i's scores, so XLA
cannot overlap or elide them), timed end to end including the one
host round-trip and the per-batch device-side packing.  On this rig
the host link is a tunnel with ~40ms RTT; per-batch timing would
measure the tunnel, not the chip.

Baseline = the reference implementation's per-pair DP throughput,
measured with this framework's native C++ engine, which runs the same
algorithm with identical results (single thread, as the reference
binaries' inner loop does per thread).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

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


def bench_tpu(B=65536, R=64, n_reps=5):
    import functools

    import jax
    import jax.numpy as jnp

    from t1k_tpu.ops.align_pallas_band import (
        LANES, _band_grid, _round_up, band_window)

    G = 8
    Lt, Lp = 112, 100
    ML = 5
    W = band_window(ML, Lt - Lp)
    P = G * LANES
    nblocks = -(-B // P)
    Lt_pad = _round_up(max(Lt + ML + 1, Lp + W + 1) + 1, 8)
    Lp_pad = _round_up(Lp, 8)

    # Generate the first batch ON DEVICE (same distribution as
    # make_batch); only scalars cross the tunnel during timing.
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

    @functools.partial(jax.jit, static_argnames=("reps",))
    def chained(t0, p0, reps):
        def body(i, carry):
            acc, t, p = carry
            s = _band_grid(t, tl, p, pl, G, ML, Lp, Lt, Lt_pad, Lp_pad,
                           nblocks, W=W)
            # next batch derived from this batch's scores: a true data
            # dependency, so consecutive batches cannot overlap/elide
            d = (s % 3 + 1).astype(jnp.int8)
            t = (t + d[:, None]) % 4
            p = (p + d[:, None]) % 4
            return acc + s.sum(), t, p
        acc, _, _ = jax.lax.fori_loop(0, reps, body, (jnp.int32(0), t0, p0))
        return acc

    t0d, p0d = gen(1)
    jax.block_until_ready((t0d, p0d))
    jax.block_until_ready(chained(t0d, p0d, R))  # compile + warm
    # every timed rep gets a DISTINCT input batch and fetches the
    # scalar checksum: repeated identical calls can be served from a
    # relay-side cache on this rig and time as pure RTT
    variants = [gen(seed) for seed in range(2, 2 + n_reps)]
    jax.block_until_ready(variants)
    times = []
    for t0d, p0d in variants:
        t0 = time.perf_counter()
        int(chained(t0d, p0d, R))
        times.append(time.perf_counter() - t0)
    times.sort()
    dt = times[len(times) // 2]  # median: robust to relay dips
    return B * R / dt


def main():
    baseline = bench_native_baseline()
    tpu = bench_tpu()

    # Roofline accounting at the benchmark shape (Lt=112, Lp=100, band
    # 5, W=32, G=8) — see docs/tpu_pipeline.md "Band-kernel roofline".
    # Per DP row each pair occupies W=32 int32 sublane elements and the
    # kernel body issues ~65 vector ops per element (hand count of the
    # score variant: sub 6, e/h/u 16, 5-step Kogge-Stone exclusive max
    # 22, selects/masks 21).  The useful band is left+right+1 = 23 of
    # the 32 window sublanes at this shape.
    OPS_PER_ELEM = 65
    W_WIN, BAND_CELLS, ROWS = 32, 23, 100
    vector_ops = tpu * ROWS * W_WIN * OPS_PER_ELEM
    band_cells = tpu * ROWS * BAND_CELLS
    # v5e VPU peak: 4 ALUs x (8x128) lanes x ~1.5GHz clock (the clock
    # that reproduces the chip's published 197 TFLOP/s bf16 with 4
    # 128x128 MXUs) = ~6.1e12 int32 op/s; HBM ~819 GB/s.
    VPU_PEAK = 4 * 8 * 128 * 1.5e9
    HBM_BW = 819e9
    bytes_per_pair = 112 + 100 + 8 + 4  # t + p + lens + score out
    print(json.dumps({
        "metric": "banded_align_pairs_per_s_per_chip",
        "value": round(tpu),
        "unit": "pairs/s",
        "vs_baseline": round(tpu / baseline, 3),
        "roofline": {
            "band_cells_per_s": round(band_cells),
            "vector_ops_per_s": round(vector_ops),
            "vpu_peak_ops_per_s": round(VPU_PEAK),
            "vpu_utilization": round(vector_ops / VPU_PEAK, 3),
            "band_occupancy": round(BAND_CELLS / W_WIN, 3),
            "hbm_fraction": round(tpu * bytes_per_pair / HBM_BW, 5),
            "bound": "compute (VPU)",
        },
    }))


if __name__ == "__main__":
    main()
