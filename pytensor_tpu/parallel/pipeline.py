"""Pipeline parallelism: GPipe micro-batch schedule over a mesh axis.

TPU-native pp (SURVEY §5.8): one pipeline STAGE per device along the
``pipe`` mesh axis; activations move stage-to-stage with
``lax.ppermute`` over ICI; micro-batches keep every stage busy after
the fill phase (bubble = (S-1)/(S-1+M)).  The per-stage compute is a
pytensor graph lowered through the framework's own XLA path
(fgraph_to_jax), so rewrites/fusions apply inside each stage; the
schedule is `shard_map`ped so each device runs ONLY its stage.

Reverse-mode AD flows through the whole schedule (the transpose of
ppermute is the reverse ring), giving 1F1B-equivalent gradients without
hand-written backward plumbing.
"""

from __future__ import annotations

import numpy as np


def _stage_layer_fn(mb, d, dtype="float32"):
    """Per-stage compute y = tanh(x @ W + b), built as a pytensor graph
    and lowered via the framework's XLA dispatch."""
    import pytensor_tpu.tensor as pt
    from pytensor_tpu.compile.mode import FAST_RUN
    from pytensor_tpu.graph.fg import FunctionGraph
    from pytensor_tpu.link.xla.linker import fgraph_to_jax

    W = pt.tensor("W", dtype=dtype, shape=(d, d))
    b = pt.tensor("b", dtype=dtype, shape=(d,))
    x = pt.tensor("x", dtype=dtype, shape=(mb, d))
    y = pt.tanh(pt.dot(x, W) + b)
    fg = FunctionGraph([W, b, x], [y], clone=True)
    FAST_RUN.optimizer.rewrite(fg)
    return fgraph_to_jax(fg)


def make_pipeline_train_step(mesh, *, axis="pipe", n_micro=8, mb=4, d=8,
                             lr=0.05, seed=0):
    """Return (step_fn, params, batches): ``step_fn(W, b, xs, ys)`` runs
    one forward+backward+SGD over the pipeline and returns
    (W', b', loss).  W: (n_stages, d, d) sharded along ``axis``."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    n_stages = mesh.shape[axis]
    layer = _stage_layer_fn(mb, d)
    ring = [(i, (i + 1) % n_stages) for i in range(n_stages)]

    def stage_step(W_l, b_l, xs, ys):
        # W_l: (1, d, d) local stage params; xs/ys: (n_micro, mb, d)
        # replicated (only stage 0 consumes xs, only the last stage ys)
        idx = jax.lax.axis_index(axis)
        n_t = n_micro + n_stages - 1

        def fwd(W1, b1):
            def body(carry, t):
                buf = carry
                k_in = jnp.minimum(t, n_micro - 1)
                inp = jnp.where(idx == 0, xs[k_in], buf)
                y = layer(W1[0], b1[0], inp)[0]  # fgraph_to_jax returns a tuple
                nxt = jax.lax.ppermute(y, axis, ring)
                # the LAST stage emits micro-batch t-(n_stages-1) now
                k_out = t - (n_stages - 1)
                emit = jnp.where((idx == n_stages - 1) & (k_out >= 0),
                                 y, jnp.zeros_like(y))
                return nxt, (emit, k_out)

            # the carry becomes device-varying after the first ppermute;
            # mark the init varying so scan's carry types match
            init = jax.lax.pcast(jnp.zeros((mb, d), W1.dtype), (axis,),
                                 to="varying")
            _, (emits, ks) = jax.lax.scan(body, init, jnp.arange(n_t))
            # gather emitted micro-batches into order (ks >= 0 slots)
            outs = jnp.zeros((n_micro, mb, d), W1.dtype)
            outs = outs.at[jnp.clip(ks, 0, n_micro - 1)].add(
                jnp.where((ks >= 0)[:, None, None], emits, 0.0))
            # loss lives on the last stage; psum replicates it
            local = jnp.where(idx == n_stages - 1,
                              ((outs - ys) ** 2).mean(), 0.0)
            return jax.lax.psum(local, axis)

        loss, (gW, gb) = jax.value_and_grad(fwd, argnums=(0, 1))(W_l, b_l)
        return W_l - lr * gW, b_l - lr * gb, loss

    from jax.experimental.shard_map import shard_map

    step = jax.jit(shard_map(
        stage_step, mesh=mesh,
        in_specs=(P(axis), P(axis), P(), P()),
        out_specs=(P(axis), P(axis), P()),
    ))

    rng = np.random.default_rng(seed)
    W = jax.device_put(
        (rng.standard_normal((n_stages, d, d)) * 0.3).astype("float32"),
        NamedSharding(mesh, P(axis)))
    b = jax.device_put(np.zeros((n_stages, d), "float32"),
                       NamedSharding(mesh, P(axis)))
    xs = jax.device_put(
        rng.standard_normal((n_micro, mb, d)).astype("float32"),
        NamedSharding(mesh, P()))
    ys = jax.device_put(
        np.tanh(rng.standard_normal((n_micro, mb, d))).astype("float32"),
        NamedSharding(mesh, P()))
    return step, (W, b), (xs, ys)
