"""Heterogeneous pipeline stages (round-4 item: lift the same-structure
constraint in parallel/pipeline.py).

A 4-stage 8->16->16->4 MLP with per-stage parameter counts (stage 2 has
a bias, the others don't) trains one GPipe step on a 4-device 'pipe'
mesh; the updated parameters must equal a serial (single-device,
no-pipeline) SGD step to 1e-6.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pytensor_tpu.parallel.pipeline import (
    PipelineStructureError,
    make_hetero_pipeline_train_step,
)


def _mesh(n):
    devs = jax.devices()
    if len(devs) < n:
        pytest.skip(f"needs {n} devices")
    return jax.sharding.Mesh(np.array(devs[:n]), ("pipe",))


WIDTHS = [8, 16, 16, 4]
MB, N_MICRO, LR = 2, 8, 0.05


def _stages():
    # stage 1 is tanh(x@W); stage 2 is tanh(x@W + b) — different param
    # counts on purpose
    def s0(x, W):
        return jnp.tanh(x @ W)

    def s1(x, W):
        return jnp.tanh(x @ W)

    def s2(x, W, b):
        return jnp.tanh(x @ W + b)

    def s3(x, W):
        return x @ W

    return [s0, s1, s2, s3]


def _params(seed=0):
    rng = np.random.default_rng(seed)
    d = WIDTHS
    return [
        (rng.standard_normal((d[0], d[1])).astype("float32") * 0.4,),
        (rng.standard_normal((d[1], d[2])).astype("float32") * 0.4,),
        (rng.standard_normal((d[2], d[2])).astype("float32") * 0.4,
         np.zeros((d[2],), "float32")),
        (rng.standard_normal((d[2], d[3])).astype("float32") * 0.4,),
    ]


def _data(seed=1):
    rng = np.random.default_rng(seed)
    xs = rng.standard_normal((N_MICRO, MB, WIDTHS[0])).astype("float32")
    ys = rng.standard_normal((N_MICRO, MB, WIDTHS[-1])).astype("float32")
    return xs, ys


def _serial_step(params, xs, ys):
    """The same model + MSE loss + SGD step with no pipeline."""
    stages = _stages()

    def loss(flat_params):
        p0, p1, p2a, p2b, p3 = flat_params
        h = xs.reshape(-1, WIDTHS[0])
        h = stages[0](h, p0)
        h = stages[1](h, p1)
        h = stages[2](h, p2a, p2b)
        pred = stages[3](h, p3)
        return ((pred - ys.reshape(-1, WIDTHS[-1])) ** 2).mean()

    flat = (params[0][0], params[1][0], params[2][0], params[2][1],
            params[3][0])
    l, g = jax.value_and_grad(loss)(tuple(jnp.asarray(p) for p in flat))
    new = [p - LR * gi for p, gi in zip(flat, g)]
    return [(new[0],), (new[1],), (new[2], new[3]), (new[4],)], float(l)


def test_hetero_pipeline_matches_serial():
    mesh = _mesh(4)
    params = _params()
    xs, ys = _data()
    step, pack, unpack = make_hetero_pipeline_train_step(
        _stages(), mesh=mesh, n_micro=N_MICRO, lr=LR,
        example_params=params, example_x=xs[0])
    packed = jax.device_put(
        pack(params),
        jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec("pipe")))
    new_packed, loss_v = step(packed, xs, ys)
    got = unpack(new_packed)
    want, want_loss = _serial_step(params, xs, ys)
    assert abs(float(loss_v) - want_loss) < 1e-6
    want_flat = [want[0][0], want[1][0], want[2][0], want[2][1],
                 want[3][0]]
    got_flat = [got[0][0], got[1][0], got[2][0], got[2][1], got[3][0]]
    for w, g in zip(want_flat, got_flat):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   atol=1e-6, rtol=1e-6)


def test_hetero_pipeline_loss_decreases():
    mesh = _mesh(4)
    params = _params()
    xs, ys = _data()
    step, pack, unpack = make_hetero_pipeline_train_step(
        _stages(), mesh=mesh, n_micro=N_MICRO, lr=LR,
        example_params=params, example_x=xs[0])
    packed = pack(params)
    losses = []
    for _ in range(3):
        packed, l = step(packed, xs, ys)
        losses.append(float(l))
    assert losses[-1] < losses[0]


def test_structure_errors():
    mesh = _mesh(4)
    params = _params()
    xs, _ = _data()
    with pytest.raises(PipelineStructureError, match="stages"):
        make_hetero_pipeline_train_step(
            _stages()[:3], mesh=mesh, example_params=params[:3],
            example_x=xs[0])
    bad = [tuple(p.astype("float64") if i == 1 else p for p in ps)
           for i, ps in enumerate(params)]
    bad[1] = (bad[1][0].astype("float64"),)
    with pytest.raises(PipelineStructureError, match="dtype"):
        make_hetero_pipeline_train_step(
            _stages(), mesh=mesh, example_params=bad, example_x=xs[0])

    def collapse(x, W):
        return (x @ W)[:1]

    stages = _stages()
    stages[1] = collapse
    with pytest.raises(PipelineStructureError, match="micro-batch"):
        make_hetero_pipeline_train_step(
            stages, mesh=mesh, example_params=params, example_x=xs[0])


def test_pytensor_graph_stage():
    """A stage given as a pytensor_tpu (inputs, output) graph pair goes
    through the framework's own rewrite+lowering path."""
    import pytensor_tpu.tensor as pt

    mesh = _mesh(4)
    params = _params()
    xs, ys = _data()

    x = pt.tensor("x", dtype="float32", shape=(MB, WIDTHS[1]))
    W = pt.tensor("W", dtype="float32", shape=(WIDTHS[1], WIDTHS[2]))
    graph_stage = ([x, W], pt.tanh(pt.dot(x, W)))

    stages = _stages()
    stages[1] = graph_stage
    step, pack, unpack = make_hetero_pipeline_train_step(
        stages, mesh=mesh, n_micro=N_MICRO, lr=LR,
        example_params=params, example_x=xs[0])
    new_packed, loss_v = step(pack(params), xs, ys)
    want, want_loss = _serial_step(params, xs, ys)
    assert abs(float(loss_v) - want_loss) < 1e-6
    np.testing.assert_allclose(np.asarray(unpack(new_packed)[1][0]),
                               np.asarray(want[1][0]), atol=1e-6)
