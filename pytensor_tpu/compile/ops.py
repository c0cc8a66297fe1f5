"""Compile-support ops: DeepCopy, View, FromFunction (black-box python).

Parallels /root/reference/pytensor/compile/ops.py (DeepCopyOp:121,
ViewOp:87, FromFunctionOp:198, as_op:258).
"""

from __future__ import annotations

import copy
from typing import Callable, Sequence

import numpy as np

from pytensor_tpu.graph.basic import Apply, Variable
from pytensor_tpu.graph.op import Op


class TypeCastingOp(Op):
    """Base for ops that merely reinterpret their input."""

    view_map = {0: [0]}

    def perform(self, node, inputs, output_storage):
        output_storage[0][0] = inputs[0]


class ViewOp(TypeCastingOp):
    __props__ = ()

    def make_node(self, x):
        return Apply(self, [x], [x.type()])

    def infer_shape(self, fgraph, node, input_shapes):
        return input_shapes

    def L_op(self, inputs, outputs, output_grads):
        return output_grads


view_op = ViewOp()


class DeepCopyOp(Op):
    """Copy the input (protects function outputs from aliasing shared
    storage; on XLA arrays are immutable so this lowers to identity)."""

    __props__ = ()

    def make_node(self, x):
        return Apply(self, [x], [x.type()])

    def perform(self, node, inputs, output_storage):
        x = inputs[0]
        if isinstance(x, np.ndarray):
            output_storage[0][0] = x.copy()
        else:
            output_storage[0][0] = copy.deepcopy(x)

    def infer_shape(self, fgraph, node, input_shapes):
        return input_shapes

    def L_op(self, inputs, outputs, output_grads):
        return output_grads


deep_copy_op = DeepCopyOp()


class FromFunctionOp(Op):
    """Black-box python op from a function (lowered via pure_callback on
    XLA; reference FromFunctionOp:198)."""

    def __init__(self, fn, itypes, otypes, infer_shape=None, name=None):
        self._fn = fn
        self.itypes = list(itypes)
        self.otypes = list(otypes)
        self._infer_shape = infer_shape
        self.name = name or getattr(fn, "__name__", "FromFunctionOp")

    def __eq__(self, other):
        return type(self) is type(other) and self._fn == other._fn

    def __hash__(self):
        return hash((type(self), self._fn))

    def __str__(self):
        return f"FromFunctionOp{{{self.name}}}"

    def perform(self, node, inputs, output_storage):
        outs = self._fn(*inputs)
        if not isinstance(outs, (list, tuple)):
            outs = (outs,)
        for s, o, ot in zip(output_storage, outs, self.otypes):
            s[0] = ot.filter(o)

    def infer_shape(self, fgraph, node, input_shapes):
        if self._infer_shape is not None:
            return self._infer_shape(fgraph, node, input_shapes)
        raise NotImplementedError()


def as_op(itypes, otypes, infer_shape=None):
    """Decorator: wrap a python function as a black-box Op."""

    if not isinstance(itypes, (list, tuple)):
        itypes = [itypes]
    if not isinstance(otypes, (list, tuple)):
        otypes = [otypes]

    def make_op(fn):
        return FromFunctionOp(fn, itypes, otypes, infer_shape)

    return make_op


wrap_py = as_op


def register_view_op_c_code(type, code, version=()):
    """No-op: the reference registers per-Type C snippets for its C
    backend (compile/ops.py:18); on the XLA backend ViewOp lowers to
    identity and no C code exists to register."""


def register_deep_copy_op_c_code(typ, code, version=()):
    """No-op (see register_view_op_c_code)."""
