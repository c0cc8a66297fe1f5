"""Two-layer MLP training step with Megatron-style tensor parallelism.

dp x tp showcase for the parallel layer: batch shards over the mesh's
'data' axis, the hidden dimension shards over 'model' — W1 is
column-parallel (d, h/tp per device), W2 is row-parallel (h/tp, out),
so the second matmul produces partial sums and GSPMD inserts the
all-reduce (psum) over the 'model' axis.  No reference analog (the
reference is single-device, SURVEY §5.8) — this is the TPU-native
scaling recipe: annotate shardings, let XLA place the collectives on ICI.
"""

from __future__ import annotations

import numpy as np

import pytensor_tpu as ptt
import pytensor_tpu.tensor as pt


def make_mlp_training_step(n=64, d=32, h=64, dtype="float32", lr=0.1,
                           seed=0, mesh=None):
    """Compiled SGD step for a 2-layer MLP (tanh, sigmoid head).

    With ``mesh`` given (axes 'data' and 'model'), runs dp x tp sharded.
    Returns (step_fn, (X, y), (W1, b1, W2, b2)).
    """
    rng = np.random.default_rng(seed)
    W1 = ptt.shared((0.1 * rng.standard_normal((d, h))).astype(dtype), name="W1")
    b1 = ptt.shared(np.zeros(h, dtype), name="b1")
    W2 = ptt.shared((0.1 * rng.standard_normal((h, 1))).astype(dtype), name="W2")
    b2 = ptt.shared(np.zeros((), dtype), name="b2")

    X = pt.tensor("X", dtype=dtype, shape=(None, d))
    y = pt.tensor("y", dtype=dtype, shape=(None,))

    hid = pt.tanh(pt.dot(X, W1) + b1)          # column-parallel matmul
    logit = pt.dot(hid, W2)[:, 0] + b2         # row-parallel -> psum
    p = pt.sigmoid(logit)
    eps = np.asarray(1e-7, dtype)
    loss = -pt.mean(y * pt.log(p + eps) + (1 - y) * pt.log(1 - p + eps))
    grads = ptt.grad(loss, [W1, b1, W2, b2])
    updates = {v: v - lr * g for v, g in zip((W1, b1, W2, b2), grads)}

    if mesh is None:
        f = ptt.function([X, y], loss, updates=updates, name="mlp_step")
    else:
        from jax.sharding import PartitionSpec as P

        from pytensor_tpu import parallel

        f = parallel.function(
            [X, y], loss, updates=updates, mesh=mesh,
            input_specs=[P("data", None), P("data")],
            shared_specs={
                W1: P(None, "model"),   # column parallel
                b1: P("model"),
                W2: P("model", None),   # row parallel (partial-sum + psum)
                b2: P(),
            },
            name="mlp_step_dp_tp",
        )
    Xv = rng.random((n, d)).astype(dtype)
    yv = (rng.random(n) < 0.5).astype(dtype)
    return f, (Xv, yv), (W1, b1, W2, b2)


def make_mlp_mfu_step(batch=4096, d=4096, depth=4, dtype="bfloat16",
                      lr=1e-3, seed=0, n_steps_per_call=1):
    """MXU-saturating deep MLP SGD step for the MFU benchmark.

    ``depth`` square (d, d) GEMMs per forward pass, relu between them,
    MSE head; the backward pass adds ~2x the forward GEMM FLOPs.  All
    matmuls run in ``dtype`` (bfloat16 by default — the MXU-native
    format); the loss is reduced in float32.  Returns
    ``(step_fn, flops_per_step)`` where the step function takes no
    arguments (data lives in shared/constant device buffers so the
    benchmark measures compute, not host transfer).

    No reference analog benchmark exists at this scale — the closest is
    the reference GEMM suite (/root/reference/tests/benchmarks/
    test_blas.py:11-52); this workload exists to report achieved
    FLOP/s and MFU on the TPU (VERDICT r2 Missing #4).
    """
    import jax
    import jax.numpy as jnp
    import ml_dtypes

    jdt = jnp.bfloat16 if dtype == "bfloat16" else jnp.dtype(dtype)
    np_dt = ml_dtypes.bfloat16 if dtype == "bfloat16" else np.dtype(dtype)

    def dev_ramp(n, c, scale=1.0):
        # pseudo-random data generated ON DEVICE: a host->device
        # transfer of these buffers through the tunnel would dominate
        # setup, and embedding them as graph constants blows the
        # remote-compile HLO size limit
        return jax.jit(lambda: (scale * jnp.sin(
            jnp.arange(n, dtype=jnp.float32) * c)).astype(jdt))()

    Ws = [
        ptt.shared(dev_ramp(d * d, 0.7 + 0.13 * i, 0.02).reshape(d, d),
                   name=f"W{i}")
        for i in range(depth)
    ]
    # data/targets are INPUTS fed with device arrays (inside a scan body
    # a device-array constant would be captured as a closure and lowered
    # as a giant HLO literal; as inputs they become scan non-sequences
    # and top-level jit arguments)
    X = pt.tensor("X", dtype=dtype, shape=(batch, d))
    T = pt.tensor("T", dtype=dtype, shape=(batch, d))
    Xd = dev_ramp(batch * d, 0.31).reshape(batch, d)
    Td = dev_ramp(batch * d, 0.17).reshape(batch, d)

    h = X
    for W in Ws:
        h = pt.maximum(pt.dot(h, W), np.asarray(0, np_dt))
    diff = pt.cast(h - T, "float32")
    loss = pt.mean(diff * diff)
    grads = ptt.grad(loss, Ws)
    lr_c = np.asarray(lr, np_dt)
    updates = {W: W - lr_c * pt.cast(g, dtype) for W, g in zip(Ws, grads)}

    if n_steps_per_call > 1:
        f = ptt.train_loop([X, T], loss, updates, n_steps=n_steps_per_call,
                           name="mlp_mfu_loop")
    else:
        f = ptt.function([X, T], loss, updates=updates, name="mlp_mfu_step")
    f.trust_input = True
    # fwd: depth GEMMs; bwd: dX and dW per layer -> 3x fwd GEMM flops
    flops_per_step = depth * 3 * 2 * batch * d * d
    return f, flops_per_step, (Xd, Td)


def make_gemm_chain(batch=8192, d=8192, nmat=4, dtype="bfloat16", seed=0,
                    n_steps_per_call=1):
    """Raw GEMM chain: x -> x @ W1 @ ... @ Wn, rescaled for chaining.

    Returns ``(f, x0, flops_per_call)``: ``f`` maps a (batch, d) input
    through ``nmat`` MXU-saturating square matmuls and renormalizes so
    the output can feed the next call (device-side dependency chain for
    timing through the axon tunnel).
    """
    import jax
    import jax.numpy as jnp

    jdt = jnp.bfloat16 if dtype == "bfloat16" else jnp.dtype(dtype)

    def dev_w(i):
        # weights generated ON DEVICE (tunnel transfer would dominate);
        # held as SHARED device arrays so they reach the executable as
        # runtime parameters (scan non-sequences), never HLO literals
        return jax.jit(lambda: (jnp.sin(
            jnp.arange(d * d, dtype=jnp.float32) * (0.7 + 0.13 * i))
            / np.sqrt(d)).astype(jdt).reshape(d, d))()

    Ws = [ptt.shared(dev_w(i), name=f"G{i}") for i in range(nmat)]
    x0 = jax.jit(
        lambda: jnp.sin(jnp.arange(batch * d, dtype=jnp.float32)
                        * 0.31).reshape(batch, d).astype(jdt))()
    xs = ptt.shared(x0, name="gx", shape=(batch, d))
    y = xs
    for W in Ws:
        y = pt.dot(y, W)
    # renormalize in f32 so repeated application stays finite
    scale = pt.sqrt(pt.mean(pt.cast(y, "float32") ** 2)) + np.float32(1e-6)
    out = pt.cast(pt.cast(y, "float32") / scale, dtype)
    # n_steps_per_call chain applications compile into ONE on-device
    # loop (matching the fori harness the ref-jax side gets)
    f = ptt.train_loop([], pt.cast(scale, "float32"), {xs: out},
                       n_steps=n_steps_per_call, name="gemm_loop")
    flops_per_call = n_steps_per_call * nmat * 2 * batch * d * d
    return f, flops_per_call
