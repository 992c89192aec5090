"""Deterministic AOT executable store (utils/aot.py).

The store must (1) be inert off-TPU, (2) produce the same key across
processes for the same program (the fix for the nondeterministic
jax-persistent-cache key that kept Pallas first-call compiles in the
picture for every fresh process), and (3) round-trip executables whose
results equal the jit path.
"""

import numpy as np
import pytest


def test_aot_inert_on_cpu(monkeypatch, tmp_path):
    """On the CPU platform the wrapper must behave exactly like jax.jit
    and write nothing."""
    import functools

    from t1k_tpu.utils.aot import aot_jit

    monkeypatch.setenv("T1K_AOT_DIR", str(tmp_path))

    @functools.partial(aot_jit, static_argnames=("k",))
    def f(x, k):
        return x * k

    out = f(np.ones(8, np.float32), k=3)
    np.testing.assert_allclose(np.asarray(out), 3.0)
    assert list(tmp_path.iterdir()) == []


_ROUNDTRIP_SCRIPT = r"""
import sys
import numpy as np
from t1k_tpu.utils import aot

aot._active = lambda: True  # CPU executables serialize too

def g(x, y, k, flag=False):
    return x * k - y if not flag else x + y

store = sys.argv[1]
import os
os.environ["T1K_AOT_DIR"] = store

f1 = aot.aot_jit(g, static_argnames=("k", "flag"))
x = np.arange(8, dtype=np.float32)
y = np.ones(8, np.float32)
out1 = np.asarray(f1(x, y, 3, flag=True))   # statics: positional + kw
np.testing.assert_array_equal(out1, x + y)
entries = os.listdir(store)
assert len(entries) == 1, entries

# fresh wrapper = a fresh process's view; must HIT the persisted entry
loaded = {"n": 0}
real_load = aot._load
def counting_load(key):
    r = real_load(key)
    loaded["n"] += r is not None
    return r
aot._load = counting_load
aot._loaded.clear()
f2 = aot.aot_jit(g, static_argnames=("k", "flag"))
out2 = np.asarray(f2(x, y, 3, flag=True))
assert loaded["n"] == 1, "second wrapper should hit the store"
assert len(os.listdir(store)) == 1, "no duplicate entry (key determinism)"
np.testing.assert_array_equal(out1, out2)

# different statics -> different program -> second entry
out3 = np.asarray(f2(x, y, 5, flag=False))
np.testing.assert_array_equal(out3, x * 5 - y)
assert len(os.listdir(store)) == 2

# corrupt entry falls back to a fresh compile
for e in os.listdir(store):
    open(os.path.join(store, e), "wb").write(b"garbage")
aot._load = real_load
aot._loaded.clear()
f3 = aot.aot_jit(g, static_argnames=("k", "flag"))
np.testing.assert_array_equal(np.asarray(f3(x, y, 3, flag=True)), x + y)
print("ROUNDTRIP-OK")
"""


def test_aot_store_roundtrip_and_key_determinism(tmp_path):
    """Compile + persist exactly one entry; a fresh wrapper for the same
    program HITS it (the canonical-IR key is deterministic); positional
    statics are stripped for the compiled call; corrupt entries fall
    back.  Runs in a clean single-device CPU subprocess — the pytest
    process's 8-virtual-device mesh changes the executable's device
    assignment and is not the store's production environment (TPU)."""
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env.update({"JAX_PLATFORMS": "cpu", "PYTHONPATH": repo})
    store = tmp_path / "store"
    store.mkdir()
    p = subprocess.run(
        [sys.executable, "-c", _ROUNDTRIP_SCRIPT, str(store)],
        env=env, capture_output=True, text=True, timeout=300)
    assert p.returncode == 0, p.stderr[-4000:]
    assert "ROUNDTRIP-OK" in p.stdout
