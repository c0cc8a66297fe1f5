"""AOT executable cache (config.xla__aot_cache): warm processes load a
pickled compiled executable and skip trace + compile entirely — the
reference ModuleCache role (/root/reference/pytensor/link/c/cmodule.py:612),
played here by jax.experimental.serialize_executable.
"""

import os
import subprocess
import sys

SNIPPET = r"""
import jax; jax.config.update('jax_platforms', 'cpu')
import numpy as np
import pytensor_tpu as ptt
import pytensor_tpu.tensor as pt
X = pt.tensor('X', dtype='float32', shape=(64, 16))
w = pt.tensor('w', dtype='float32', shape=(16,))
out = pt.sigmoid(pt.dot(X, w)).sum()
g = ptt.grad(out, w)
f = ptt.function([X, w], [out, g])
rng = np.random.default_rng(7)
Xv = rng.random((64, 16), 'f4'); wv = rng.random(16, 'f4')
r = f(Xv, wv)
print('RESULT', float(np.asarray(r[0])), float(np.asarray(r[1]).sum()))
"""


def _run(cache_dir):
    env = dict(os.environ)
    env["PYTENSOR_TPU_FLAGS"] = f"floatX=float32,xla__cache_dir={cache_dir}"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    r = subprocess.run([sys.executable, "-c", SNIPPET], env=env,
                       capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]
    line = [ln for ln in r.stdout.splitlines() if ln.startswith("RESULT")][-1]
    return tuple(float(x) for x in line.split()[1:])


def test_aot_executable_cache_round_trip(tmp_path):
    cache = str(tmp_path / "aot")
    os.makedirs(cache)
    cold = _run(cache)
    pkls = [p for p in os.listdir(cache) if p.startswith("aot-")]
    assert pkls, "cold run must serialize an executable"
    warm = _run(cache)
    assert warm == cold
    # warm run must not have added a second entry for the same graph
    assert [p for p in os.listdir(cache) if p.startswith("aot-")] == pkls
    # corrupt entry: next process recompiles instead of crashing
    with open(os.path.join(cache, pkls[0]), "wb") as fh:
        fh.write(b"not a pickle")
    assert _run(cache) == cold
