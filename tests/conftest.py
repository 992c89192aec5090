import os
import sys

# Multi-chip sharding tests run on a virtual CPU mesh.  The platform is
# forced via jax.config (environment-variable routing can be overridden
# by site-installed TPU plugins); must happen before backend init.
if not os.environ.get("T1K_REAL_DEVICE"):
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    try:
        import jax

        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "golden")
DATA_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "data")


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "tpu: needs real TPU hardware (auto-skips elsewhere)")


def pytest_terminal_summary(terminalreporter, exitstatus, config):
    """Loudly list environment-gated skips: a green run with the
    reference checkout / binaries / real device absent silently skips
    the cross-validation tests, and the headline pass count must not be
    read as including them (VERDICT r4 weak #5)."""
    skipped = terminalreporter.stats.get("skipped", [])
    gated = {}
    for rep in skipped:
        reason = rep.longrepr[2] if isinstance(rep.longrepr, tuple) else str(
            rep.longrepr)
        low = reason.lower()
        if ("reference" in low or "tpu" in low or "real device" in low
                or "t1k_real_device" in low):
            gated.setdefault(reason.replace("Skipped: ", ""), []).append(
                rep.nodeid)
    if not gated:
        return
    tw = terminalreporter
    tw.section("environment-gated skips (NOT covered by this run)",
               sep="=", yellow=True, bold=True)
    for reason, ids in sorted(gated.items()):
        tw.write_line(f"  [{len(ids)} test(s)] {reason}", yellow=True)
        for nid in ids:
            tw.write_line(f"      {nid}")
