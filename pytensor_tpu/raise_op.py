"""Runtime assertions as graph nodes.

Parallels /root/reference/pytensor/raise_op.py (CheckAndRaise:26,
Assert:148).  XLA lowering uses jax.debug callbacks (checkify-style hard
aborts are not TPU-friendly); under jit the check runs on host
asynchronously.
"""

from __future__ import annotations

import numpy as np

from pytensor_tpu.graph.basic import Apply
from pytensor_tpu.graph.null_type import DisconnectedType
from pytensor_tpu.graph.op import Op
from pytensor_tpu.tensor.basic import as_tensor_variable


class ExceptionType:
    pass


class CheckAndRaise(Op):
    """Pass through input 0; raise ``exc_type(msg)`` if any condition is false."""

    view_map = {0: [0]}

    def __init__(self, exc_type=AssertionError, msg=""):
        self.exc_type = exc_type
        self.msg = msg

    def __eq__(self, other):
        return (type(self) is type(other) and self.exc_type == other.exc_type
                and self.msg == other.msg)

    def __hash__(self):
        return hash((type(self), self.exc_type, self.msg))

    def make_node(self, value, *conds):
        value = as_tensor_variable(value)
        conds = [as_tensor_variable(c) for c in conds]
        return Apply(self, [value, *conds], [value.type()])

    def perform(self, node, inputs, output_storage):
        value, *conds = inputs
        for c in conds:
            if not np.all(c):
                raise self.exc_type(self.msg)
        output_storage[0][0] = value

    def infer_shape(self, fgraph, node, input_shapes):
        return [input_shapes[0]]

    def connection_pattern(self, node):
        return [[True]] + [[False] for _ in node.inputs[1:]]

    def L_op(self, inputs, outputs, output_grads):
        return [output_grads[0]] + [
            DisconnectedType()() for _ in inputs[1:]
        ]

    def __str__(self):
        return f"CheckAndRaise{{{self.exc_type.__name__}({self.msg})}}"


class Assert(CheckAndRaise):
    def __init__(self, msg="PyTensorTPU Assert failed!"):
        super().__init__(AssertionError, msg)

    def __str__(self):
        return f"Assert{{msg={self.msg}}}"


assert_op = Assert()


def assert_(value, *conds):
    return assert_op(value, *conds)


def _register_xla():
    from pytensor_tpu.link.xla.dispatch import xla_funcify

    @xla_funcify.register(CheckAndRaise)
    def _check_and_raise(op, node=None, **kw):
        import jax
        import jax.numpy as jnp

        msg = op.msg
        exc_name = op.exc_type.__name__

        def check_and_raise(value, *conds):
            for c in conds:
                ok = jnp.all(jnp.asarray(c))

                def _raise(ok_val):
                    if not ok_val:
                        raise op.exc_type(msg)

                jax.debug.callback(_raise, ok)
            return value

        return check_and_raise


_register_xla()
