import os
import sys

# Multi-chip sharding tests run on a virtual CPU mesh; must be set before
# jax initializes.  Real-TPU benchmarks opt out via T1K_REAL_DEVICE=1.
if not os.environ.get("T1K_REAL_DEVICE"):
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "golden")
DATA_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "data")
