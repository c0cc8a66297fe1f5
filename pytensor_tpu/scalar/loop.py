"""ScalarLoop: fixed-count scalar iteration (reference scalar/loop.py
ScalarLoop:10 — used for iterative special-function gradients).

TPU-first: lowers to lax.fori_loop (or lax.while_loop for the until
form); applied through tensors it broadcasts elementwise, so the loop
runs vectorized on the VPU.
"""

from __future__ import annotations

import numpy as np

from pytensor_tpu.graph.basic import Apply, Constant, Variable
from pytensor_tpu.graph.fg import FunctionGraph
from pytensor_tpu.graph.op import HasInnerGraph, Op
from pytensor_tpu.tensor.basic import as_tensor_variable, cast
from pytensor_tpu.tensor.type import TensorType


class ScalarLoop(Op, HasInnerGraph):
    """Iterate an elementwise update: state' = f(state, *constants).

    init/update are graphs over 0-d (or broadcastable) variables; applied
    to tensors the loop body maps elementwise.  Inputs at call time:
    (n_steps, *init, *constants); outputs: final states.
    """

    def __init__(self, init: list, update: list, constant: list | None = None,
                 until=None, name=None):
        constant = constant or []
        self.fgraph = FunctionGraph(
            list(init) + list(constant),
            list(update) + ([until] if until is not None else []),
            clone=True,
        )
        self.n_states = len(update)
        self.n_constants = len(constant)
        self.is_while = until is not None
        self.name = name

    def __eq__(self, other):
        return self is other

    def __hash__(self):
        return id(self)

    @property
    def inner_inputs(self):
        return self.fgraph.inputs

    @property
    def inner_outputs(self):
        return self.fgraph.outputs

    def clone(self):
        import copy as _copy

        res = _copy.copy(self)
        res.fgraph = self.fgraph.clone()
        return res

    def make_node(self, n_steps, *inputs):
        n_steps = as_tensor_variable(n_steps)
        inputs = [as_tensor_variable(i) for i in inputs]
        if len(inputs) != self.n_states + self.n_constants:
            raise ValueError(
                f"ScalarLoop expected {self.n_states + self.n_constants} inputs"
            )
        outs = [
            TensorType(self.fgraph.outputs[k].type.dtype, inputs[k].type.shape)()
            for k in range(self.n_states)
        ]
        return Apply(self, [n_steps, *inputs], outs)

    def _inner_fn(self):
        from pytensor_tpu.link.xla.linker import fgraph_to_jax

        return fgraph_to_jax(self.fgraph)

    def perform(self, node, inputs, output_storage):
        n_steps, *rest = inputs
        states = [np.asarray(r) for r in rest[: self.n_states]]
        constants = rest[self.n_states:]
        fn = self._inner_fn()
        for _ in range(int(n_steps)):
            res = fn(*states, *constants)
            new_states = list(res[: self.n_states])
            if self.is_while and not np.all(res[-1]):
                states = [np.asarray(s) for s in new_states]
                break
            states = [np.asarray(s) for s in new_states]
        for s, out in zip(output_storage, states):
            s[0] = np.asarray(out)

    def infer_shape(self, fgraph, node, input_shapes):
        return [input_shapes[1 + k] for k in range(self.n_states)]

    def L_op(self, inputs, outputs, output_grads):
        from pytensor_tpu.gradient import grad_not_implemented

        return [
            grad_not_implemented(self, i, inp,
                                 "ScalarLoop grads: differentiate the closed form")
            for i, inp in enumerate(inputs)
        ]

    def __str__(self):
        return f"ScalarLoop{{{self.name or self.n_states}}}"


def _register_xla():
    from pytensor_tpu.link.xla.dispatch import _concrete, xla_funcify

    @xla_funcify.register(ScalarLoop)
    def _scalar_loop(op, node=None, **kw):
        import jax
        import jax.numpy as jnp

        inner = op._inner_fn()
        n_states = op.n_states

        def scalar_loop(n_steps, *rest):
            states = tuple(jnp.asarray(r) for r in rest[:n_states])
            constants = rest[n_states:]
            T = int(_concrete(n_steps, "ScalarLoop n_steps"))
            if not op.is_while:
                def body(_, st):
                    res = inner(*st, *constants)
                    return tuple(res[:n_states])

                final = jax.lax.fori_loop(0, T, body, states)
            else:
                def cond(carry):
                    st, t, alive = carry
                    return jnp.logical_and(t < T, alive)

                def body(carry):
                    st, t, alive = carry
                    res = inner(*st, *constants)
                    return tuple(res[:n_states]), t + 1, jnp.all(res[-1])

                final, _, _ = jax.lax.while_loop(
                    cond, body, (states, jnp.asarray(0), jnp.asarray(True))
                )
            return final if n_states > 1 else final[0]

        return scalar_loop


_register_xla()
