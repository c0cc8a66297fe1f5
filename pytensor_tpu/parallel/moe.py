"""Expert parallelism: Switch-style top-1 MoE over a mesh axis.

TPU-native ep (SURVEY §5.8; the reference is single-device): one EXPERT
per device along the ``expert`` mesh axis; tokens route with the dense
one-hot dispatch of Switch Transformer (static shapes — no
data-dependent gathers, so XLA compiles it) and cross the ICI with
``lax.all_to_all``.

This is a FRAMEWORK API: ``make_moe_train_step`` takes any user expert
computation — a compiled ``pytensor_tpu`` Function, an
``(inputs, output)`` graph pair, or a jax-traceable callable — mapping
``(tokens, *expert_params) -> tokens`` with any number of per-expert
parameters.  Router gradients flow through the softmax gate value
(argmax itself is non-differentiable, as in the reference MoE
formulations).
"""

from __future__ import annotations

import numpy as np


def make_moe_train_step(expert, *, mesh, axis="expert", d,
                        tokens_per_dev=16, capacity=None, lr=0.05):
    """Routed training step for an arbitrary user expert graph.

    expert: ``(x, *params) -> y`` with x (E*C, d) local expert tokens
        (see ``pipeline.as_stage_callable`` for accepted forms).
    Returns ``step(Wg, expert_params, x, y) -> (Wg', params', loss)``:
    Wg (d, E) replicated router; each expert-params leaf stacked with a
    leading E dim sharded along ``axis``; x/y (E*tokens_per_dev, d)
    sharded along ``axis``.
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    from pytensor_tpu.parallel.pipeline import as_stage_callable

    expert_fn = as_stage_callable(expert)
    E = mesh.shape[axis]
    C = capacity if capacity is not None else tokens_per_dev

    def local_step(Wg, params_l, x_l, y_l):
        T = x_l.shape[0]

        def fwd(Wg1, params1):
            locals_ = [p[0] for p in params1]
            logits = x_l @ Wg1                       # (T, E)
            probs = jax.nn.softmax(logits)
            assign = jnp.argmax(logits, axis=-1)     # (T,)
            gate = probs[jnp.arange(T), assign]      # (T,)
            onehot = jax.nn.one_hot(assign, E, dtype=x_l.dtype)
            pos = (jnp.cumsum(onehot, axis=0) - 1.0) * onehot
            slot = (pos * onehot).sum(-1)            # position in expert
            keep = (slot < C)
            # dense dispatch tensor (T, E, C)
            disp = (onehot * keep[:, None])[:, :, None] * jax.nn.one_hot(
                slot.astype(jnp.int32), C, dtype=x_l.dtype)[:, None, :]
            send = jnp.einsum("tec,td->ecd", disp, x_l)   # (E, C, d)
            recv = jax.lax.all_to_all(send, axis, split_axis=0,
                                      concat_axis=0, tiled=True)  # (E*C, d)
            out = expert_fn(recv, *locals_)               # local expert
            back = jax.lax.all_to_all(out, axis, split_axis=0,
                                      concat_axis=0, tiled=True)
            back = back.reshape(E, C, d)
            comb = jnp.einsum("tec,ecd->td", disp, back) * gate[:, None]
            local = ((comb - y_l) ** 2).mean()
            return jax.lax.pmean(local, axis)

        loss, grads = jax.value_and_grad(fwd, argnums=(0, 1))(
            Wg, tuple(params_l))
        gWg = jax.lax.pmean(grads[0], axis)  # router is replicated
        new_params = tuple(p - lr * g for p, g in zip(params_l, grads[1]))
        return Wg - lr * gWg, new_params, loss

    def wrapped(Wg, params, x, y):
        Wg2, new_params, loss = local_step(Wg, tuple(params), x, y)
        return Wg2, tuple(new_params), loss

    def step(Wg, params, x, y):
        params = tuple(params)
        sharded = shard_map(
            wrapped, mesh=mesh,
            in_specs=(P(), (P(axis),) * len(params), P(axis), P(axis)),
            out_specs=(P(), (P(axis),) * len(params), P()),
        )
        return jax.jit(sharded)(Wg, params, x, y)

    return step


def make_demo_moe_train_step(mesh, *, axis="expert", tokens_per_dev=16,
                             d=8, h=16, capacity=None, lr=0.05, seed=0):
    """Dryrun/demo instantiation: a relu(x@W1)@W2 expert FFN built as a
    pytensor graph and compiled through ``pytensor_tpu.function``."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    import pytensor_tpu as ptt
    import pytensor_tpu.tensor as pt

    E = mesh.shape[axis]
    C = capacity if capacity is not None else tokens_per_dev
    dtype = "float32"
    W1 = pt.tensor("W1", dtype=dtype, shape=(d, h))
    W2 = pt.tensor("W2", dtype=dtype, shape=(h, d))
    x = pt.tensor("x", dtype=dtype, shape=(E * C, d))
    y = pt.dot(pt.maximum(pt.dot(x, W1), np.asarray(0.0, dtype)), W2)
    expert_f = ptt.function([x, W1, W2], y, name="ep_expert")

    step = make_moe_train_step(expert_f, mesh=mesh, axis=axis, d=d,
                               tokens_per_dev=tokens_per_dev,
                               capacity=capacity, lr=lr)

    rng = np.random.default_rng(seed)
    Wg = jax.device_put((rng.standard_normal((d, E)) * 0.3).astype(dtype),
                        NamedSharding(mesh, P()))
    W1v = jax.device_put(
        (rng.standard_normal((E, d, h)) * 0.3).astype(dtype),
        NamedSharding(mesh, P(axis)))
    W2v = jax.device_put(
        (rng.standard_normal((E, h, d)) * 0.3).astype(dtype),
        NamedSharding(mesh, P(axis)))
    xv = jax.device_put(
        rng.standard_normal((E * tokens_per_dev, d)).astype(dtype),
        NamedSharding(mesh, P(axis)))
    yv = jax.device_put(
        np.tanh(rng.standard_normal((E * tokens_per_dev, d))).astype(dtype),
        NamedSharding(mesh, P(axis)))
    return step, (Wg, (W1v, W2v)), (xv, yv)