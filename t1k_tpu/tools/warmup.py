"""Precompile the canonical device-kernel set into the local caches.

Kernel compiles on a relay-attached TPU take 50-400s per variant
(congestion-dependent); the shapes of every hot program are canonical
(see DeferredDescService._pow2_pad), so ONE warmup run makes every
subsequent pipeline invocation load its kernels locally.  The hot
entry points are aot_jit-wrapped (utils/aot.py), so this run populates
BOTH caches: JAX's persistent compilation cache AND the deterministic
AOT executable store — the latter's key is stable across processes
(sha256 of the canonical lowered IR), so fresh processes reach their
first dispatch in well under a second.  EM-loop shapes are exact per
dataset (not padded), so the EM benefits on repeat runs of the same
data rather than from this warmup.  The phase-A screen kernels bake
the panel's sequence count as a static (their posting layout depends
on it), so a NEW panel always compiles its screen variants on first
use — 50-400s each through a congested relay — and hits both caches
on every run after.  Pass your production panel to prewarm it:

  python -m t1k_tpu.tools.warmup [panel.fa]
"""

from __future__ import annotations

import sys
import time

import numpy as np


def warmup_band_kernels(verbose: bool = True) -> None:
    from ..ops.align_pallas_band import (_DESC_BUCKETS,
                                         make_deferred_desc_service)

    svc = make_deferred_desc_service()
    svc.set_ref(np.zeros(1024, np.int8))
    svc.set_layout(np.array([0], np.int64), np.array([256], np.int64))
    svc.begin_batch(np.zeros(256, np.int8))
    lower = 0
    for lb in _DESC_BUCKETS:
        t0 = time.time()
        n = 4
        svc.stats(np.zeros(n, np.int64), np.full(n, lb, np.int32),
                  np.zeros(n, np.int64), np.full(n, max(lower + 1, 8),
                                                 np.int32))
        if verbose:
            print(f"band stats kernel Lb={lb}: {time.time() - t0:.1f}s",
                  file=sys.stderr)
        lower = lb


def warmup_kmer_classifier(verbose: bool = True) -> None:
    """The extractor prefilter kernel at its common shapes (row count is
    padded to powers of two >= 256 by classify_reads; read length varies
    by dataset so only the dominant 100-151bp class is prewarmed)."""
    from ..ops.kmer import DeviceKmerTable, classify_reads

    class _P:  # minimal packed-ref stand-in
        n = 1
        seq_starts = np.array([0], np.int64)
        seq_lens = np.array([64], np.int32)
        seq_codes = np.arange(64, dtype=np.int64) % 4

    for k in (9, 11, 12):
        table = DeviceKmerTable.build(_P, k)
        for L in (100, 151):
            t0 = time.time()
            classify_reads(table, np.zeros((256, L), np.int8),
                           np.full(256, L, np.int32))
            if verbose:
                print(f"kmer classify k={k} L={L}: {time.time() - t0:.1f}s",
                      file=sys.stderr)


def warmup_phase_a_screen(verbose: bool = True) -> None:
    """The device extraction screen (auto-routed on TPU presence): probe
    + chain kernels at the canonical chunk shape (1024 rows, 128bp
    envelope) and the two smallest arena tiers that off-target-dominated
    chunks land in."""
    from ..ops.phase_a import DeviceScreen, PhaseAIndex

    class _P:  # minimal packed-ref stand-in
        n = 2
        seq_starts = np.array([0, 300], np.int64)
        seq_lens = np.array([300, 300], np.int32)
        seq_codes = (np.arange(600, dtype=np.int64) * 7 % 4).astype(np.int8)

    for k in (9, 11):
        dev = DeviceScreen(PhaseAIndex.build(_P, k), hit_len_required=23,
                           ref_sim=0.8, hit_cap=1 << 18)
        codes = np.tile(_P.seq_codes[:100].astype(np.int8), (1024, 1))
        lens = np.full(1024, 100, np.int32)
        t0 = time.time()
        dev.screen(codes, lens)
        if verbose:
            print(f"phase-A screen k={k}: {time.time() - t0:.1f}s",
                  file=sys.stderr)


def warmup_panel_screen(panel_fasta: str, verbose: bool = True) -> None:
    """Prewarm the extraction screen for a SPECIFIC panel: the screen
    kernels bake the panel's sequence count, so this is the variant a
    production run of that panel will load."""
    from ..constants import EXTRACTOR_HIT_LEN_PAIRED
    from ..io.reads import read_seq_file
    from ..io.refset import RefSet
    from ..ops.phase_a import DeviceScreen

    refset = RefSet(digit_units=-1, delimiter="")
    for rec in read_seq_file(panel_fasta):
        refset.add_allele(rec.id, rec.seq, rec.comment)
    packed = refset.packed()
    k = max(refset.infer_kmer_length(), 9)
    dev = DeviceScreen.build(packed, k, EXTRACTOR_HIT_LEN_PAIRED, 0.8)
    # The chain kernel is compiled per hit-arena TIER, and a chunk's
    # tier follows its measured hit volume — so warm the regimes real
    # extractions land in: an off-target-dominated batch (small tiers)
    # and a mixed batch with enough on-target rows to select the
    # ladder's TOP tier (chunks past the ladder fall back to the native
    # screen by design, so an all-on-target batch would warm nothing).
    rng = np.random.default_rng(3)
    codes = rng.integers(0, 4, (1024, 100)).astype(np.int8)
    codes[:8] = np.asarray(packed.seq_codes[:100], np.int8)[None, :]
    lens = np.full(1024, 100, np.int32)
    t0 = time.time()
    dev.screen(codes, lens)
    if verbose:
        print(f"panel screen k={k} n_seqs={packed.n} (off-target batch): "
              f"{time.time() - t0:.1f}s", file=sys.stderr)
    starts = np.asarray(packed.seq_starts)
    lens_p = np.asarray(packed.seq_lens)
    top = max(dev.tiers)
    for frac in (0.05, 0.15, 0.4):
        on = rng.integers(0, 4, (1024, 100)).astype(np.int8)
        n_on = int(1024 * frac)
        for i in range(n_on):
            s = int(starts[i % packed.n])
            ln = min(100, int(lens_p[i % packed.n]))
            on[i, :ln] = np.asarray(packed.seq_codes[s:s + ln], np.int8)
        t0 = time.time()
        dev.screen(on, lens)
        if verbose:
            print(f"panel screen k={k} n_seqs={packed.n} "
                  f"({int(frac * 100)}% on-target, top tier {top}): "
                  f"{time.time() - t0:.1f}s", file=sys.stderr)


def main() -> int:
    t0 = time.time()
    warmup_band_kernels()
    warmup_kmer_classifier()
    warmup_phase_a_screen()
    if len(sys.argv) > 1:
        warmup_panel_screen(sys.argv[1])
    print(f"warmup complete in {time.time() - t0:.1f}s", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
