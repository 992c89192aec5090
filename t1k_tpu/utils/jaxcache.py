"""Persistent XLA compilation cache.

The hot device programs (the band-packed aligner, the k-mer classifier,
the EM loop) compile in tens of seconds on a relay-attached TPU, and a
fresh process pays that on its first call — which used to dominate the
tpu backend's end-to-end wall clock (the HLA-scale deferred-DP run spent
48s of its 98s in the one first-call compile).  JAX's persistent
compilation cache stores the compiled executable (including the Mosaic
kernel binary) on local disk keyed by HLO, so every process after the
first loads it in ~0.2s.

Every module that jits device code calls enable() before defining its
jitted entry points; it is idempotent and must run before the first
compilation (entries compiled earlier are simply not cached).
"""

from __future__ import annotations

import os

_enabled = False


def enable() -> None:
    global _enabled
    if _enabled:
        return
    _enabled = True
    if os.environ.get("T1K_JAX_CACHE", "1") == "0":
        return
    # The cache exists for the slow relay-attached TPU compiles; CPU
    # compiles are fast, and reloading CPU AOT entries across machine
    # types trips XLA's feature checks (risk of SIGILL) — skip it when
    # the platform routing pins CPU (tests, virtual-mesh dry runs).
    plats = os.environ.get("JAX_PLATFORMS", "")
    if plats.split(",")[0].strip().lower() == "cpu":
        return
    cache_dir = os.environ.get("T1K_JAX_CACHE_DIR") or os.path.join(
        os.path.expanduser("~"), ".cache", "t1k_tpu", "jax")
    try:
        os.makedirs(cache_dir, exist_ok=True)
        import jax

        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # cache every entry: the relay makes even small compiles slow
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    except Exception:
        pass  # cache is an optimization; never fail import over it
