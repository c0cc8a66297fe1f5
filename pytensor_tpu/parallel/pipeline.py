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

Heterogeneous models use ``make_hetero_pipeline_train_step``: one stage
callable PER device, each with its own parameter count/shapes and its
own activation widths (e.g. 8->16->16->8).  SPMD still requires one
program and one buffer shape, so each stage's parameters are flattened
into one row of a zero-padded ``(n_stages, P_max)`` buffer and
activations ride a ``(mb, F_max)`` padded flat buffer; a ``lax.switch``
on the stage index unpacks the local row, slices the live activation
prefix, and runs that stage's own lowered graph.  Padding lanes carry
exact zeros through SGD (grads of unused lanes are zero), so the
schedule's math equals the serial model exactly.  Structural
violations raise :class:`PipelineStructureError` at build time.

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


class PipelineStructureError(TypeError):
    """A pipeline spec violates the schedule's structural requirements
    (stage count != mesh axis size, mixed parameter dtypes, micro-batch
    size changing across stages)."""


def make_hetero_pipeline_train_step(stages, loss=None, *, mesh,
                                    axis="pipe", n_micro=8, lr=0.05,
                                    example_params, example_x):
    """GPipe training step for stages with DIFFERENT structures.

    stages: one stage spec per device along ``axis`` (each accepted by
        ``as_stage_callable``); stage ``i`` computes ``(x_i, *params_i)
        -> x_{i+1}`` where every ``x`` is ``(mb, ...)`` with arbitrary,
        per-boundary trailing shape.
    example_params: list of per-stage parameter tuples (array-likes)
        fixing each stage's parameter count/shapes/dtype.
    example_x: the ``(mb, ...)`` activation entering stage 0.
    loss: optional ``(pred, target) -> scalar`` (default MSE).

    Returns ``(step, pack, unpack)``:
      - ``pack(params_list) -> (n_stages, P_max)`` zero-padded flat
        buffer (shard it along ``axis``);
      - ``step(packed, xs, ys) -> (new_packed, loss)`` with
        ``xs = (n_micro, mb, ...)`` stage-0 inputs and ``ys`` the
        ``(n_micro, mb, ...)`` targets of the LAST stage's output;
      - ``unpack(packed) -> params_list`` back to per-stage tuples.
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    n_stages = mesh.shape[axis]
    if len(stages) != n_stages:
        raise PipelineStructureError(
            f"{len(stages)} stages for a {n_stages}-device '{axis}' axis")
    if len(example_params) != n_stages:
        raise PipelineStructureError(
            f"example_params has {len(example_params)} entries, "
            f"need {n_stages}")
    stage_fns = [as_stage_callable(s) for s in stages]
    loss_fn = (as_stage_callable(loss) if loss is not None
               else (lambda pred, tgt: ((pred - tgt) ** 2).mean()))

    # ---- static metadata ------------------------------------------------
    example_params = [tuple(np.asarray(p) for p in ps)
                      for ps in example_params]
    dtypes = {p.dtype for ps in example_params for p in ps}
    if len(dtypes) > 1:
        raise PipelineStructureError(
            f"all stage parameters must share one dtype; got {dtypes}")
    pdtype = dtypes.pop() if dtypes else np.dtype("float32")
    shapes = [[p.shape for p in ps] for ps in example_params]
    sizes = [[int(np.prod(s, dtype=np.int64)) for s in ss] for ss in shapes]
    row = max((sum(ss) for ss in sizes), default=1) or 1

    # activation boundary shapes via an eval_shape chain
    x0 = np.asarray(example_x)
    mb = x0.shape[0]
    bound_shapes = [x0.shape]
    adtype = x0.dtype
    for i, fn in enumerate(stage_fns):
        ps = [jax.ShapeDtypeStruct(p.shape, p.dtype)
              for p in example_params[i]]
        out = jax.eval_shape(
            fn, jax.ShapeDtypeStruct(bound_shapes[-1], adtype), *ps)
        if out.shape[0] != mb:
            raise PipelineStructureError(
                f"stage {i} changes the micro-batch size "
                f"{mb} -> {out.shape[0]}")
        bound_shapes.append(out.shape)
    flat_widths = [int(np.prod(s[1:], dtype=np.int64)) for s in bound_shapes]
    F = max(flat_widths)
    f_last = flat_widths[-1]
    last_shape = bound_shapes[-1]

    def _branch(i):
        fn = stage_fns[i]
        offs = np.concatenate([[0], np.cumsum(sizes[i])]).astype(int)
        in_shape, f_in = bound_shapes[i], flat_widths[i]

        def run(pvec, xflat):
            params = [
                jax.lax.dynamic_slice_in_dim(pvec, int(offs[j]),
                                             sizes[i][j]).reshape(shapes[i][j])
                for j in range(len(shapes[i]))]
            x = xflat[:, :f_in].reshape(in_shape)
            y = fn(x, *params).reshape(mb, -1)
            pad = F - y.shape[1]
            if pad:
                y = jnp.pad(y, ((0, 0), (0, pad)))
            return y

        return run

    branches = [_branch(i) for i in range(n_stages)]
    ring = [(i, (i + 1) % n_stages) for i in range(n_stages)]

    def pack(params_list):
        rows = []
        for i, ps in enumerate(params_list):
            flat = (jnp.concatenate(
                [jnp.asarray(p, pdtype).ravel() for p in ps])
                if ps else jnp.zeros((0,), pdtype))
            rows.append(jnp.pad(flat, (0, row - flat.shape[0])))
        return jnp.stack(rows)

    def unpack(packed):
        packed = np.asarray(packed)
        out = []
        for i in range(n_stages):
            offs, ps = 0, []
            for j, s in enumerate(shapes[i]):
                ps.append(packed[i, offs:offs + sizes[i][j]].reshape(s))
                offs += sizes[i][j]
            out.append(tuple(ps))
        return out

    def stage_step(packed1, xsflat, ysflat):
        idx = jax.lax.axis_index(axis)
        n_t = n_micro + n_stages - 1

        def fwd(pvec):
            def body(buf, t):
                k_in = jnp.minimum(t, n_micro - 1)
                inp = jnp.where(idx == 0, xsflat[k_in], buf)
                y = jax.lax.switch(idx, branches, pvec, inp)
                nxt = jax.lax.ppermute(y, axis, ring)
                k_out = t - (n_stages - 1)
                emit = jnp.where((idx == n_stages - 1) & (k_out >= 0),
                                 y, jnp.zeros_like(y))
                return nxt, (emit, k_out)

            init = jax.lax.pcast(
                jnp.zeros((mb, F), adtype), (axis,), to="varying")
            _, (emits, ks) = jax.lax.scan(body, init, jnp.arange(n_t))
            outs = jnp.zeros((n_micro, mb, F), adtype)
            outs = outs.at[jnp.clip(ks, 0, n_micro - 1)].add(
                jnp.where((ks >= 0).reshape(-1, 1, 1), emits, 0.0))
            pred = outs[:, :, :f_last].reshape((n_micro,) + last_shape)
            tgt = ysflat[:, :, :f_last].reshape((n_micro,) + last_shape)
            local = jnp.where(idx == n_stages - 1,
                              loss_fn(pred, tgt), 0.0)
            return jax.lax.psum(local, axis)

        loss_v, g = jax.value_and_grad(fwd)(packed1[0])
        return (packed1 - lr * g[None]), loss_v

    def _flatpad(a):
        a = a.reshape(a.shape[:2] + (-1,))
        return jnp.pad(a, ((0, 0), (0, 0), (0, F - a.shape[2])))

    def step(packed, xs, ys):
        sharded = shard_map(
            stage_step, mesh=mesh,
            in_specs=(P(axis), P(), P()),
            out_specs=(P(axis), P()))
        return jax.jit(sharded)(packed, _flatpad(jnp.asarray(xs)),
                                _flatpad(jnp.asarray(ys)))

    return step, pack, unpack


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