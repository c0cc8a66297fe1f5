"""Matmul speed probe (reference misc/check_blas.py).

The reference script times gemm through its BLAS bindings to validate the
host BLAS install.  Here the equivalent question is "is the MXU being
used?": time a large bf16/f32 matmul through a compiled function and
report GFLOP/s.  Run: ``python -m pytensor_tpu.misc.check_blas``.
"""

from __future__ import annotations

import time

import numpy as np


def execute(N=2048, iters=10, dtype="float32", verbose=True):
    import pytensor_tpu as ptt
    import pytensor_tpu.tensor as pt

    A = ptt.shared(np.random.default_rng(0).standard_normal((N, N)).astype(dtype))
    B = ptt.shared(np.random.default_rng(1).standard_normal((N, N)).astype(dtype))
    C = ptt.shared(np.zeros((N, N), dtype=dtype))
    f = ptt.function([], [], updates={C: 0.4 * C + 0.8 * pt.dot(A, B)},
                     name="check_blas_gemm")
    f()  # compile + warm up
    t0 = time.perf_counter()
    for _ in range(iters):
        f()
    np.asarray(C.get_value())  # block on the device
    dt = time.perf_counter() - t0
    gflops = 2.0 * N * N * N * iters / dt / 1e9
    if verbose:
        import jax

        print(f"device: {jax.devices()[0]}")
        print(f"gemm {N}x{N} {dtype}: {dt / iters * 1000:.3f} ms/call, "
              f"{gflops:.1f} GFLOP/s")
    return gflops


if __name__ == "__main__":
    execute()
