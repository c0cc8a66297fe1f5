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
