"""wrap_jax / JAXOp: wrap an arbitrary jax function as a graph Op.

Parallels /root/reference/pytensor/link/jax/ops.py (JAXOp:16,
wrap_jax:198): the wrapped function becomes a first-class Op with a
VJP-based gradient, so foreign jax code (flax modules, custom kernels,
pallas calls) composes with the symbolic graph.
"""

from __future__ import annotations

from typing import Callable, Sequence

import numpy as np

from pytensor_tpu.graph.basic import Apply, Variable
from pytensor_tpu.graph.op import Op
from pytensor_tpu.tensor.basic import as_tensor_variable
from pytensor_tpu.tensor.type import TensorType


class JAXOp(Op):
    """An Op whose implementation is a jax function.

    input_types/output_types fix the signature; gradients come from
    jax.vjp wrapped as another JAXOp.
    """

    def __init__(self, input_types: Sequence, output_types: Sequence,
                 jax_fn: Callable, name: str | None = None):
        self.input_types = list(input_types)
        self.output_types = list(output_types)
        self.jax_fn = jax_fn
        self.name = name or getattr(jax_fn, "__name__", "jax_fn")

    def __eq__(self, other):
        return self is other

    def __hash__(self):
        return id(self)

    def make_node(self, *inputs):
        inputs = [t.filter_variable(as_tensor_variable(i))
                  for t, i in zip(self.input_types, inputs)]
        return Apply(self, inputs, [t() for t in self.output_types])

    def perform(self, node, inputs, output_storage):
        res = self.jax_fn(*inputs)
        if not isinstance(res, (list, tuple)):
            res = (res,)
        for s, r, t in zip(output_storage, res, self.output_types):
            s[0] = np.asarray(r, dtype=t.numpy_dtype)


    def L_op(self, inputs, outputs, output_grads):
        import jax

        fn = self.jax_fn
        n_out = len(self.output_types)

        def vjp_fn(*args):
            primals = args[: len(inputs)]
            cotangents = args[len(inputs):]

            def single(*p):
                res = fn(*p)
                return res if isinstance(res, tuple) else (res,)

            _, pullback_fn = jax.vjp(single, *primals)
            return pullback_fn(tuple(cotangents))

        vjp_op = JAXOp(
            [i.type for i in inputs] + [o.type for o in outputs],
            [i.type for i in inputs],
            vjp_fn,
            name=f"vjp_{self.name}",
        )
        res = vjp_op(*inputs, *output_grads)
        return res if isinstance(res, list) else [res]

    def __str__(self):
        return f"JAXOp{{{self.name}}}"


def wrap_jax(jax_fn=None, *, input_types=None, output_types=None, name=None):
    """Decorator/factory: wrap a jax function as a symbolic Op.

    With explicit types::

        op = wrap_jax(fn, input_types=[...], output_types=[...])

    As a decorator without types, the signature is inferred at first call
    from the argument variables via jax.eval_shape.
    """
    def make(fn):
        if input_types is not None and output_types is not None:
            return JAXOp(input_types, output_types, fn, name=name)

        def builder(*variables):
            import jax

            variables = [as_tensor_variable(v) for v in variables]
            in_types = [v.type for v in variables]
            structs = [
                jax.ShapeDtypeStruct(
                    tuple(1 if s is None else s for s in v.type.shape),
                    v.type.numpy_dtype,
                )
                for v in variables
            ]
            out_struct = jax.eval_shape(fn, *structs)
            flat, treedef = jax.tree_util.tree_flatten(out_struct)
            out_types = [TensorType(str(o.dtype), o.shape) for o in flat]

            def flat_fn(*args):
                res = fn(*args)
                return tuple(jax.tree_util.tree_leaves(res))

            op = JAXOp(in_types, out_types, flat_fn,
                       name=name or getattr(fn, "__name__", "jax_fn"))
            res = op(*variables)
            leaves = res if isinstance(res, list) else [res]
            return jax.tree_util.tree_unflatten(treedef, leaves)

        builder.__name__ = getattr(fn, "__name__", "wrapped_jax")
        return builder

    if jax_fn is None:
        return make
    return make(jax_fn)


def _register_xla():
    from pytensor_tpu.link.xla.dispatch import xla_funcify

    @xla_funcify.register(JAXOp)
    def _jax_op(op, node=None, **kw):
        fn = op.jax_fn
        n_out = len(op.output_types)

        def run(*args):
            res = fn(*args)
            if isinstance(res, (list, tuple)):
                return tuple(res) if n_out > 1 else res[0]
            return res

        return run


_register_xla()
