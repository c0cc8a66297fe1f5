"""Pipeline parallelism: GPipe micro-batch schedule over a mesh axis.

TPU-native pp (SURVEY §5.8; the reference is single-device): one
pipeline STAGE per device along the ``pipe`` mesh axis; activations move
stage-to-stage with ``lax.ppermute`` over ICI; micro-batches keep every
stage busy after the fill phase (bubble = (S-1)/(S-1+M)).

This is a FRAMEWORK API, not a demo: ``make_pipeline_train_step`` takes
any user stage computation — a compiled ``pytensor_tpu`` Function, a
``(inputs, output)`` graph pair, or a jax-traceable callable — with any
number of per-stage parameters, plus an optional user loss graph.  The
stage graph is rewritten+lowered through the framework's own XLA path,
so fusions/canonicalizations apply inside each stage.  Constraints of
the stacked-stage schedule: every stage shares the layer STRUCTURE
(same param shapes; the values differ per stage) and the inter-stage
activation shape is uniform — the transformer-layers case.

Reverse-mode AD flows through the whole schedule (the transpose of
ppermute is the reverse ring), giving 1F1B-equivalent gradients without
hand-written backward plumbing.
"""

from __future__ import annotations

import numpy as np


def as_stage_callable(stage):
    """Normalize a stage spec to a jax-traceable callable.

    Accepts: a compiled pytensor_tpu Function; an ``(inputs, output)``
    pair of graph variables (rewritten with FAST_RUN then lowered); or
    a plain callable (used as-is).
    """
    from pytensor_tpu.compile.executor import Function
    from pytensor_tpu.compile.mode import FAST_RUN
    from pytensor_tpu.graph.basic import Variable
    from pytensor_tpu.graph.fg import FunctionGraph
    from pytensor_tpu.link.xla.linker import fgraph_to_jax

    if isinstance(stage, Function):
        raw = stage.maker.linker.make_jax_fn()
        return lambda *a: raw(*a)[0]
    if isinstance(stage, tuple) and len(stage) == 2 and all(
            isinstance(v, Variable) for v in stage[0]):
        inputs, output = stage
        fg = FunctionGraph(list(inputs), [output], clone=True)
        FAST_RUN.optimizer.rewrite(fg)
        fn = fgraph_to_jax(fg)
        return lambda *a: fn(*a)[0]
    if callable(stage):
        return stage
    raise TypeError(f"cannot make a stage callable from {type(stage)}")


def make_pipeline_train_step(layer, loss=None, *, mesh, axis="pipe",
                             n_micro=8, lr=0.05):
    """GPipe training step for an arbitrary user stage graph.

    layer: stage computation ``(x, *params) -> y`` (see
        ``as_stage_callable``); x and y share one (mb, ...) shape.
    loss: optional ``(pred, target) -> scalar`` (default: MSE).
    Returns ``step(params, xs, ys) -> (new_params, loss)`` compiled as a
    ``shard_map`` over the mesh: each ``params`` leaf is stacked with a
    leading ``n_stages`` dim sharded along ``axis``; xs/ys are
    ``(n_micro, mb, ...)`` replicated.
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    layer_fn = as_stage_callable(layer)
    loss_fn = (as_stage_callable(loss) if loss is not None
               else (lambda pred, tgt: ((pred - tgt) ** 2).mean()))
    n_stages = mesh.shape[axis]
    ring = [(i, (i + 1) % n_stages) for i in range(n_stages)]

    def stage_step(params_l, xs, ys):
        # params_l: pytree of (1, ...) local stage params;
        # xs/ys: (n_micro, mb, ...) replicated (stage 0 consumes xs,
        # the last stage ys)
        idx = jax.lax.axis_index(axis)
        n_t = n_micro + n_stages - 1

        def fwd(params1):
            locals_ = [p[0] for p in params1]

            def body(carry, t):
                buf = carry
                k_in = jnp.minimum(t, n_micro - 1)
                inp = jnp.where(idx == 0, xs[k_in], buf)
                y = layer_fn(inp, *locals_)
                nxt = jax.lax.ppermute(y, axis, ring)
                k_out = t - (n_stages - 1)
                emit = jnp.where((idx == n_stages - 1) & (k_out >= 0),
                                 y, jnp.zeros_like(y))
                return nxt, (emit, k_out)

            init = jax.lax.pcast(
                jnp.zeros(xs.shape[1:], xs.dtype), (axis,), to="varying")
            _, (emits, ks) = jax.lax.scan(body, init, jnp.arange(n_t))
            outs = jnp.zeros_like(xs)
            outs = outs.at[jnp.clip(ks, 0, n_micro - 1)].add(
                jnp.where(
                    (ks >= 0).reshape((-1,) + (1,) * (emits.ndim - 1)),
                    emits, 0.0))
            local = jnp.where(idx == n_stages - 1,
                              loss_fn(outs, ys), 0.0)
            return jax.lax.psum(local, axis)

        loss_v, grads = jax.value_and_grad(fwd)(tuple(params_l))
        new_params = tuple(p - lr * g for p, g in zip(params_l, grads))
        return new_params, loss_v

    def wrapped(params, xs, ys):
        new_params, loss_v = stage_step(tuple(params), xs, ys)
        return tuple(new_params), loss_v

    def step(params, xs, ys):
        params = tuple(params)
        sharded = shard_map(
            wrapped, mesh=mesh,
            in_specs=((P(axis),) * len(params), P(), P()),
            out_specs=((P(axis),) * len(params), P()),
        )
        return jax.jit(sharded)(params, xs, ys)

    return step


def make_demo_pipeline_train_step(mesh, *, axis="pipe", n_micro=8, mb=4,
                                  d=8, lr=0.05, seed=0):
    """The dryrun/demo instantiation: a tanh(x @ W + b) stage built as a
    pytensor graph and compiled through ``pytensor_tpu.function``."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    import pytensor_tpu as ptt
    import pytensor_tpu.tensor as pt

    dtype = "float32"
    W = pt.tensor("W", dtype=dtype, shape=(d, d))
    b = pt.tensor("b", dtype=dtype, shape=(d,))
    x = pt.tensor("x", dtype=dtype, shape=(mb, d))
    y = pt.tanh(pt.dot(x, W) + b)
    layer_f = ptt.function([x, W, b], y, name="pp_stage")

    step = make_pipeline_train_step(layer_f, mesh=mesh, axis=axis,
                                    n_micro=n_micro, lr=lr)

    n_stages = mesh.shape[axis]
    rng = np.random.default_rng(seed)
    Wv = jax.device_put(
        (rng.standard_normal((n_stages, d, d)) * 0.3).astype(dtype),
        NamedSharding(mesh, P(axis)))
    bv = jax.device_put(np.zeros((n_stages, d), dtype),
                        NamedSharding(mesh, P(axis)))
    xs = jax.device_put(
        rng.standard_normal((n_micro, mb, d)).astype(dtype),
        NamedSharding(mesh, P()))
    ys = jax.device_put(
        np.tanh(rng.standard_normal((n_micro, mb, d))).astype(dtype),
        NamedSharding(mesh, P()))
    return step, (Wv, bv), (xs, ys)