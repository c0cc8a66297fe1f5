"""Logistic regression: the elemwise-fusion + GEMV benchmark config
(BASELINE.md: sigmoid(X.w+b) cross-entropy + grad), plus a full SGD
training step with shared-parameter updates for the multi-chip dry run.
"""

from __future__ import annotations

import numpy as np

import pytensor_tpu as ptt
import pytensor_tpu.tensor as pt


def make_logreg_graphs(n=8192, d=256, dtype="float32", seed=0):
    rng = np.random.default_rng(seed)
    X = pt.tensor("X", dtype=dtype, shape=(None, d))
    y = pt.tensor("y", dtype=dtype, shape=(None,))
    w = pt.tensor("w", dtype=dtype, shape=(d,))
    b = pt.tensor("b", dtype=dtype, shape=())
    p = pt.sigmoid(pt.dot(X, w) + b)
    eps = np.asarray(1e-7, dtype)
    xent = -pt.mean(y * pt.log(p + eps) + (1 - y) * pt.log(1 - p + eps))
    gw, gb = ptt.grad(xent, [w, b])
    Xv = rng.random((n, d)).astype(dtype)
    yv = (rng.random(n) < 0.5).astype(dtype)
    wv = np.zeros(d, dtype)
    bv = np.zeros((), dtype)
    return [X, y, w, b], [xent, gw, gb], (Xv, yv, wv, bv)


def make_logreg_training_step(n=8192, d=256, dtype="float32", lr=0.1, seed=0,
                              mesh=None, batch_axis="data",
                              n_steps_per_call=1):
    """Compiled SGD step with shared params; optionally mesh-sharded
    data-parallel over the batch dimension."""
    rng = np.random.default_rng(seed)
    w = ptt.shared(np.zeros(d, dtype), name="w")
    b = ptt.shared(np.zeros((), dtype), name="b")
    X = pt.tensor("X", dtype=dtype, shape=(None, d))
    y = pt.tensor("y", dtype=dtype, shape=(None,))
    p = pt.sigmoid(pt.dot(X, w) + b)
    eps = np.asarray(1e-7, dtype)
    xent = -pt.mean(y * pt.log(p + eps) + (1 - y) * pt.log(1 - p + eps))
    gw, gb = ptt.grad(xent, [w, b])
    updates = {w: w - lr * gw, b: b - lr * gb}
    if mesh is None:
        if n_steps_per_call > 1:
            # ONE on-device loop per call: the TPU deployment pattern
            # (compile/train.py train_loop)
            f = ptt.train_loop([X, y], xent, updates,
                               n_steps=n_steps_per_call,
                               name="logreg_loop")
        else:
            f = ptt.function([X, y], xent, updates=updates,
                             name="logreg_step")
    else:
        from pytensor_tpu import parallel
        from jax.sharding import PartitionSpec as P

        f = parallel.function(
            [X, y], xent, updates=updates, mesh=mesh,
            input_specs=[P(batch_axis, None), P(batch_axis)],
            shared_specs={w: P(), b: P()},
            name="logreg_step_dp",
        )
    Xv = rng.random((n, d)).astype(dtype)
    yv = (rng.random(n) < 0.5).astype(dtype)
    return f, (Xv, yv), (w, b)
