"""Precompile the canonical device-kernel set into the persistent cache.

Kernel compiles on a relay-attached TPU take 50-400s per variant
(congestion-dependent); the shapes of every hot program are canonical
(see DeferredDescService._pow2_pad), so ONE warmup run makes every
subsequent pipeline invocation load its kernels from the local
persistent cache in ~0.2s.  Run once per machine / jaxlib upgrade:

  python -m t1k_tpu.tools.warmup
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


def main() -> int:
    t0 = time.time()
    warmup_band_kernels()
    warmup_kmer_classifier()
    print(f"warmup complete in {time.time() - t0:.1f}s", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
