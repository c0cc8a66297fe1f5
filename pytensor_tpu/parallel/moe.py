"""Expert parallelism: Switch-style top-1 MoE over a mesh axis.

TPU-native ep (SURVEY §5.8): one EXPERT per device along the ``expert``
mesh axis; tokens route to experts with the dense one-hot dispatch of
Switch Transformer (static shapes — no data-dependent gathers, so XLA
compiles it), and cross on the ICI with ``lax.all_to_all``.  The expert
FFN itself is a pytensor graph lowered through the framework's XLA
path.  Router gradients flow through the softmax gate value (argmax is
non-differentiable, as in the reference MoE formulations).
"""

from __future__ import annotations

import numpy as np


def _expert_ffn(cap_total, d, h, dtype="float32"):
    """relu(x @ W1) @ W2, built as a pytensor graph."""
    import pytensor_tpu.tensor as pt
    from pytensor_tpu.compile.mode import FAST_RUN
    from pytensor_tpu.graph.fg import FunctionGraph
    from pytensor_tpu.link.xla.linker import fgraph_to_jax

    W1 = pt.tensor("W1", dtype=dtype, shape=(d, h))
    W2 = pt.tensor("W2", dtype=dtype, shape=(h, d))
    x = pt.tensor("x", dtype=dtype, shape=(cap_total, d))
    y = pt.dot(pt.maximum(pt.dot(x, W1), 0.0), W2)
    fg = FunctionGraph([W1, W2, x], [y], clone=True)
    FAST_RUN.optimizer.rewrite(fg)
    return fgraph_to_jax(fg)


def make_moe_train_step(mesh, *, axis="expert", tokens_per_dev=16, d=8,
                        h=16, capacity=None, lr=0.05, seed=0):
    """Return (step_fn, params, batch): ``step_fn(Wg, W1, W2, x, y)``
    runs one routed forward+backward+SGD step and returns updated
    params + loss.  W1: (E, d, h) sharded along ``axis`` (one expert per
    device); x/y: (E*tokens_per_dev, d) sharded along ``axis``."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    E = mesh.shape[axis]
    C = capacity if capacity is not None else tokens_per_dev
    ffn = _expert_ffn(E * C, d, h)

    def local_step(Wg, W1_l, W2_l, x_l, y_l):
        # Wg (d, E) replicated router; W1_l (1, d, h) local expert;
        # x_l (T, d) local tokens
        T = x_l.shape[0]

        def fwd(Wg1, W11, W21):
            logits = x_l @ Wg1                       # (T, E)
            probs = jax.nn.softmax(logits)
            assign = jnp.argmax(logits, axis=-1)     # (T,)
            gate = probs[jnp.arange(T), assign]      # (T,)
            onehot = jax.nn.one_hot(assign, E, dtype=x_l.dtype)
            pos = (jnp.cumsum(onehot, axis=0) - 1.0) * onehot
            slot = (pos * onehot).sum(-1)            # (T,) position in expert
            keep = (slot < C)
            # dense dispatch tensor (T, E, C): token t -> (expert, slot)
            disp = (onehot * keep[:, None])[:, :, None] * jax.nn.one_hot(
                slot, C, dtype=x_l.dtype)[:, None, :]
            send = jnp.einsum("tec,td->ecd", disp, x_l)   # (E, C, d)
            # all_to_all: expert e collects every device's e-th block
            recv = jax.lax.all_to_all(send, axis, split_axis=0,
                                      concat_axis=0, tiled=True)  # (E*C, d)
            out = ffn(W11[0], W21[0], recv)[0]  # fgraph_to_jax returns a tuple                # local expert FFN
            back = jax.lax.all_to_all(out, axis, split_axis=0,
                                      concat_axis=0, tiled=True)
            back = back.reshape(E, C, d)
            comb = jnp.einsum("tec,ecd->td", disp, back) * gate[:, None]
            local = ((comb - y_l) ** 2).mean()
            return jax.lax.pmean(local, axis)

        loss, grads = jax.value_and_grad(fwd, argnums=(0, 1, 2))(
            Wg, W1_l, W2_l)
        gWg = jax.lax.pmean(grads[0], axis)  # router is replicated
        return (Wg - lr * gWg, W1_l - lr * grads[1], W2_l - lr * grads[2],
                loss)

    from jax.experimental.shard_map import shard_map

    step = jax.jit(shard_map(
        local_step, mesh=mesh,
        in_specs=(P(), P(axis), P(axis), P(axis), P(axis)),
        out_specs=(P(), P(axis), P(axis), P()),
    ))

    rng = np.random.default_rng(seed)
    Wg = jax.device_put((rng.standard_normal((d, E)) * 0.3).astype("float32"),
                        NamedSharding(mesh, P()))
    W1 = jax.device_put(
        (rng.standard_normal((E, d, h)) * 0.3).astype("float32"),
        NamedSharding(mesh, P(axis)))
    W2 = jax.device_put(
        (rng.standard_normal((E, h, d)) * 0.3).astype("float32"),
        NamedSharding(mesh, P(axis)))
    x = jax.device_put(
        rng.standard_normal((E * tokens_per_dev, d)).astype("float32"),
        NamedSharding(mesh, P(axis)))
    y = jax.device_put(
        np.tanh(rng.standard_normal((E * tokens_per_dev, d))).astype(
            "float32"),
        NamedSharding(mesh, P(axis)))
    return step, (Wg, W1, W2), (x, y)
