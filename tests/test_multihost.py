"""N>=2 hosts: the sharded EM runs across real *processes* via
jax.distributed (the way a pod slice runs it), and every host converges
to the single-process answer.

SURVEY.md section 4 calls for exactly this validation ("multi-host
without a cluster": jax.distributed on the CPU backend); BASELINE.md
names N>=2-host execution as a north-star config.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_em_matches_single_process(tmp_path):
    nproc = 2
    port = _free_port()
    procs = []
    for pid in range(nproc):
        env = dict(os.environ)
        env.pop("XLA_FLAGS", None)
        env.update({
            "JAX_PLATFORMS": "cpu",
            "T1K_COORDINATOR": f"127.0.0.1:{port}",
            "T1K_NUM_PROCESSES": str(nproc),
            "T1K_PROCESS_ID": str(pid),
            "PYTHONPATH": REPO,
        })
        procs.append(subprocess.Popen(
            [sys.executable, os.path.join(REPO, "tests",
                                          "multihost_worker.py"),
             str(tmp_path)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE))
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=300)
        outs.append((p.returncode, out, err))
    for rc, out, err in outs:
        assert rc == 0, err.decode()[-4000:]

    # every process must hold the identical replicated result
    x0 = np.load(tmp_path / "x_0.npy")
    x1 = np.load(tmp_path / "x_1.npy")
    np.testing.assert_array_equal(x0, x1)

    # ... equal to the single-process sharded path on the same problem
    from t1k_tpu.parallel.mesh import data_mesh, em_quantify_sharded

    rng = np.random.default_rng(5)
    ec_cnt, rg_cnt = 97, 400
    nnz = rg_cnt * 3
    seg_rg = np.sort(rng.integers(0, rg_cnt, nnz)).astype(np.int32)
    seg_ec = rng.integers(0, ec_cnt, nnz).astype(np.int32)
    counts = rng.integers(1, 4, nnz).astype(np.float64)
    ec_len = rng.integers(800, 2000, ec_cnt).astype(np.float64)
    init = np.ones(ec_cnt, np.float64)

    ref = em_quantify_sharded(data_mesh(4), seg_rg, seg_ec, counts,
                              rg_cnt, ec_len, init, iterations=12)
    # f32 psum reduction order differs across process boundaries;
    # agreement is to float32 roundoff
    np.testing.assert_allclose(x0, ref, rtol=1e-4, atol=1e-6)
