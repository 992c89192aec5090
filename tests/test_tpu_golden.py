"""Real-chip golden: genotype a small panel end-to-end with
`--backend tpu` (compiled Pallas kernels, NOT interpret mode) and compare
byte-wise against the committed golden.  Runs only when actual TPU
hardware is reachable; auto-skips elsewhere (the suite's conftest pins
in-process JAX to a virtual CPU mesh, so this test drives a subprocess
with a clean JAX environment)."""

import os
import subprocess
import sys

import pytest

from conftest import DATA_DIR, GOLDEN_DIR

CYP_RNA = os.environ.get(
    "T1K_CYP2D6_IDX", "/root/reference/vcf_database/cyp2d6_idx"
) + "/cyp2d6_rna_seq.fa"

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _clean_env():
    """Environment for the subprocess: undo the conftest's CPU pinning
    but keep everything the platform plugin needs (e.g. the axon TPU
    plugin rides PYTHONPATH and JAX_PLATFORMS)."""
    env = dict(os.environ)
    if env.get("JAX_PLATFORMS") == "cpu":
        del env["JAX_PLATFORMS"]  # conftest's pin, not the rig's
    flags = env.get("XLA_FLAGS", "")
    flags = " ".join(f for f in flags.split()
                     if "host_platform_device_count" not in f)
    if flags:
        env["XLA_FLAGS"] = flags
    else:
        env.pop("XLA_FLAGS", None)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    return env


def _tpu_present() -> bool:
    try:
        probe = subprocess.run(
            [sys.executable, "-c",
             "import jax; d = jax.devices()[0].platform; "
             "print('YES' if d not in ('cpu',) else 'NO')"],
            capture_output=True, text=True, env=_clean_env(), timeout=120)
    except subprocess.TimeoutExpired:
        return False  # wedged/unreachable device counts as absent
    return probe.returncode == 0 and "YES" in probe.stdout


@pytest.mark.tpu
def test_tpu_backend_golden(tmp_path):
    if not os.path.exists(CYP_RNA):
        pytest.skip("cyp2d6 database unavailable")
    if not _tpu_present():
        pytest.skip("no TPU hardware reachable")
    out = tmp_path / "g"
    r = subprocess.run(
        [sys.executable, "-m", "t1k_tpu.cli.genotype",
         "-f", CYP_RNA,
         "-1", os.path.join(DATA_DIR, "rna_1.fq"),
         "-2", os.path.join(DATA_DIR, "rna_2.fq"),
         "-o", str(out), "--backend", "tpu"],
        capture_output=True, text=True, env=_clean_env(), timeout=900)
    assert r.returncode == 0, r.stderr[-3000:]
    got = (str(out) + "_genotype.tsv")
    with open(got) as f, open(
            os.path.join(GOLDEN_DIR, "rna_genotype.tsv")) as g:
        assert f.read() == g.read()
    with open(str(out) + "_allele.tsv") as f, open(
            os.path.join(GOLDEN_DIR, "rna_allele.tsv")) as g:
        assert f.read() == g.read()
