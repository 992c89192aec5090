"""Worker process for the multi-host EM test (tests/test_multihost.py).

Joins a jax.distributed cluster (CPU backend, 2 virtual devices per
process), runs the collective multi-host EM on a fixed seeded problem,
and writes its replicated result to <outdir>/x_<pid>.npy.
"""

import os
import sys


def main() -> int:
    outdir = sys.argv[1]
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    flags = os.environ.get("XLA_FLAGS", "")
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=2").strip()

    import numpy as np

    from t1k_tpu.parallel.multihost import (
        em_quantify_multihost, initialize_from_env)

    pid = initialize_from_env()
    import jax
    assert jax.device_count() == 2 * int(os.environ["T1K_NUM_PROCESSES"])

    rng = np.random.default_rng(5)
    ec_cnt, rg_cnt = 97, 400
    nnz = rg_cnt * 3
    seg_rg = np.sort(rng.integers(0, rg_cnt, nnz)).astype(np.int32)
    seg_ec = rng.integers(0, ec_cnt, nnz).astype(np.int32)
    counts = rng.integers(1, 4, nnz).astype(np.float64)
    ec_len = rng.integers(800, 2000, ec_cnt).astype(np.float64)
    init = np.ones(ec_cnt, np.float64)

    x = em_quantify_multihost(seg_rg, seg_ec, counts, rg_cnt, ec_len,
                              init, iterations=12)
    np.save(os.path.join(outdir, f"x_{pid}.npy"), x)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
