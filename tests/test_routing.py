"""Backend-routing contracts (core/pipeline.py, core/genotyper.py).

The bulk-compute stages (EM at scale, extraction prefilter, cohort EM)
route on TPU *presence*; only the latency-sensitive deferred-DP offload
routes on attachment locality (RTT).  Round-3 regression: the two gates
were coupled, so a relay-attached chip (RTT ~25-40ms) where the device
EM measures 14x a host core was never used by "auto".
"""

import os

import numpy as np
import pytest


def _clear_routing_env(monkeypatch):
    for var in ("T1K_BACKEND", "T1K_BACKEND_RESOLVED", "T1K_TPU_PRESENT",
                "T1K_EM_BACKEND"):
        monkeypatch.delenv(var, raising=False)


def test_tpu_present_env_contract(monkeypatch):
    from t1k_tpu.core.pipeline import tpu_present

    _clear_routing_env(monkeypatch)
    # cached verdicts are honored without probing
    monkeypatch.setenv("T1K_TPU_PRESENT", "1")
    assert tpu_present() is True
    monkeypatch.setenv("T1K_TPU_PRESENT", "0")
    assert tpu_present() is False
    # user override beats the cache
    monkeypatch.setenv("T1K_BACKEND", "native")
    monkeypatch.setenv("T1K_TPU_PRESENT", "1")
    assert tpu_present() is False
    monkeypatch.setenv("T1K_BACKEND", "tpu")
    monkeypatch.setenv("T1K_TPU_PRESENT", "0")
    assert tpu_present() is True
    # a cpu platform pin (this test process) resolves False without a probe
    monkeypatch.delenv("T1K_BACKEND", raising=False)
    monkeypatch.delenv("T1K_TPU_PRESENT", raising=False)
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    assert tpu_present() is False


def test_locality_gate_does_not_disable_presence_routing(monkeypatch):
    """resolve_backend("auto") failing its RTT gate must NOT flip
    tpu_present() to False (the round-3 bug: the resolver cached its
    verdict into T1K_BACKEND, turning every presence-routed stage off)."""
    from t1k_tpu.core.pipeline import resolve_backend, tpu_present

    _clear_routing_env(monkeypatch)
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")  # locality gate -> native
    monkeypatch.setenv("T1K_TPU_PRESENT", "1")  # chip is present (cached)
    assert resolve_backend("auto") == "native"
    assert os.environ.get("T1K_BACKEND", "") == ""  # user env untouched
    assert tpu_present() is True


def test_pinned_absence_resolves_native_without_probe(monkeypatch):
    """A pinned T1K_TPU_PRESENT=0 (multi-process workers on a shared
    chip, cli/run.py policy) must resolve the DP backend to native
    WITHOUT spawning a probe — a worker's probe subprocess contends for
    the TPU client with process 0's device work."""
    from t1k_tpu.core import pipeline

    _clear_routing_env(monkeypatch)
    monkeypatch.delenv("JAX_PLATFORMS", raising=False)
    monkeypatch.setenv("T1K_TPU_PRESENT", "0")

    def boom(*a, **k):
        raise AssertionError("probe must not run with a pinned verdict")

    monkeypatch.setattr(pipeline, "_probe_device", boom)
    assert pipeline.resolve_backend("auto") == "native"
    assert pipeline.tpu_present() is False


def test_em_auto_routes_on_presence_and_size(monkeypatch):
    from t1k_tpu.core.genotyper import Genotyper

    _clear_routing_env(monkeypatch)
    monkeypatch.setenv("T1K_TPU_PRESENT", "1")
    # small problems stay on the bit-exact native loop even with a chip
    assert Genotyper._resolve_em_backend(1000, 100) == "native"
    # >= 5e7 dense cells with a chip present: device EM (even though the
    # deferred-DP locality gate would refuse this attachment)
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    assert Genotyper._resolve_em_backend(100_000, 1000) == "jax"
    # same size without a chip: native
    monkeypatch.setenv("T1K_TPU_PRESENT", "0")
    assert Genotyper._resolve_em_backend(100_000, 1000) == "native"
    # explicit override wins
    monkeypatch.setenv("T1K_EM_BACKEND", "jax")
    assert Genotyper._resolve_em_backend(10, 10) == "jax"


def test_extractor_gate_uses_presence(monkeypatch):
    """The device-screen gate answers True for auto+present without
    consulting the RTT-gated resolver."""
    from t1k_tpu.core.pipeline import tpu_present

    _clear_routing_env(monkeypatch)
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    monkeypatch.setenv("T1K_TPU_PRESENT", "1")
    backend = "auto"
    assert backend == "tpu" or (backend == "auto" and tpu_present())


def _em_inputs(rg_cnt=2000, ec_cnt=60, seed=3):
    rng = np.random.default_rng(seed)
    n_alleles, n_genes, n_majors = 120, 4, 24
    ec_to_alleles = [[] for _ in range(ec_cnt)]
    for a in range(n_alleles):
        ec_to_alleles[a % ec_cnt].append(a)
    offs = [0]
    ecs = []
    for _ in range(rg_cnt):
        k = rng.integers(1, 8)
        ecs.extend(rng.choice(ec_cnt, size=k, replace=False).tolist())
        offs.append(len(ecs))
    return dict(
        ec_to_alleles=ec_to_alleles,
        rg_ecs_csr=(np.array(offs, np.int64), np.array(ecs, np.int32)),
        rg_counts=rng.choice([1.0, 0.5, 2.0], rg_cnt),
        allele_eff_len=rng.integers(900, 1400, n_alleles).astype(np.int32),
        allele_missing=np.zeros(n_alleles, np.int32),
        allele_weight=rng.integers(1, 4, n_alleles).astype(np.int32),
        allele_gene=(np.arange(n_alleles) % n_genes).astype(np.int32),
        allele_major=(np.arange(n_alleles) % n_majors).astype(np.int32),
        n_genes=n_genes,
        n_majors=n_majors,
    )


def test_f32_polish_reaches_native_fixed_point():
    """Exactness gate for the device EM route: an f32 SQUAREM trajectory
    (what a TPU computes — no native f64) polished by the native f64
    loop warm-started from its solution lands on the same fixed point as
    the all-native route, to far below output-rounding resolution."""
    import jax.numpy as jnp

    from t1k_tpu.native import em_quantify
    from t1k_tpu.ops.em import em_quantify_jax

    args = _em_inputs()
    it_native, count_native = em_quantify(**args)

    it_dev, count_dev = em_quantify_jax(dtype=jnp.float32, **args)
    ec_len = np.array(
        [min(int(args["allele_eff_len"][a]) for a in alleles)
         for alleles in args["ec_to_alleles"]], dtype=np.float64)
    per_len = count_dev / ec_len
    it_pol, polished = em_quantify(init_x=per_len / per_len.sum(), **args)

    # the polish satisfies the reference's own f64 convergence criterion
    # quickly (device did the heavy iterations)
    assert it_pol <= it_native
    np.testing.assert_allclose(polished, count_native, rtol=5e-4, atol=5e-4)
    # abundance outputs round to 2 decimals (FPK x abundance); the
    # polished route must agree at far finer resolution than that
    assert float(np.abs(polished - count_native).max()) < 1e-2


def test_warm_start_at_fixed_point_converges_immediately():
    from t1k_tpu.native import em_quantify

    args = _em_inputs(rg_cnt=500, ec_cnt=30, seed=11)
    _, count = em_quantify(**args)
    ec_len = np.array(
        [min(int(args["allele_eff_len"][a]) for a in alleles)
         for alleles in args["ec_to_alleles"]], dtype=np.float64)
    per_len = count / ec_len
    it2, count2 = em_quantify(init_x=per_len / per_len.sum(), **args)
    assert it2 <= 3
    # both endpoints satisfy the reference's diffSum < 1e-5 criterion, so
    # they agree to ~1e-4 of a read — far below the 0.01 output rounding
    np.testing.assert_allclose(count2, count, rtol=1e-3, atol=1e-3)
