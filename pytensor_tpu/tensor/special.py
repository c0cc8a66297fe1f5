"""Softmax family and related composites.

Parallels /root/reference/pytensor/tensor/special.py (Softmax:26,
LogSoftmax:67, LogSumExp:102 as OpFromGraph subclasses via
tensor/symbolic.py).  Implemented here as SymbolicOp (OpFromGraph)
composites so rewrites can track them as single ops while the XLA
lowering sees the stable expanded math (or jax.nn kernels).
"""

from __future__ import annotations

import numpy as np

from pytensor_tpu.compile.builders import SymbolicOp
from pytensor_tpu.tensor import math as tm
from pytensor_tpu.tensor.basic import as_tensor_variable
from pytensor_tpu.tensor.elemwise import DimShuffle


def _normalize_axis(axis, ndim):
    if axis is None:
        return None
    if isinstance(axis, (int, np.integer)):
        return int(axis) % ndim
    raise TypeError("axis must be an int or None")


class Softmax(SymbolicOp):
    def __init__(self, x, *, axis):
        self.axis = axis
        super().__init__(x)

    def symbolic_call(self, x):
        m = tm.max(x, axis=self.axis, keepdims=True)
        e = tm.exp(x - m)
        return e / tm.sum(e, axis=self.axis, keepdims=True)


class LogSoftmax(SymbolicOp):
    def __init__(self, x, *, axis):
        self.axis = axis
        super().__init__(x)

    def symbolic_call(self, x):
        m = tm.max(x, axis=self.axis, keepdims=True)
        xm = x - m
        return xm - tm.log(tm.sum(tm.exp(xm), axis=self.axis, keepdims=True))


def _apply_sym(cls, x, axis):
    op = cls(x, axis=axis)  # builds the inner graph from x's type
    return op(x)


def softmax(x, axis=None):
    x = as_tensor_variable(x)
    if axis is None and x.type.ndim != 1:
        axis = x.type.ndim - 1 if x.type.ndim else 0
    axis = _normalize_axis(axis if axis is not None else 0, max(x.type.ndim, 1))
    return _apply_sym(Softmax, x, axis)


def log_softmax(x, axis=None):
    x = as_tensor_variable(x)
    if axis is None and x.type.ndim != 1:
        axis = x.type.ndim - 1 if x.type.ndim else 0
    axis = _normalize_axis(axis if axis is not None else 0, max(x.type.ndim, 1))
    return _apply_sym(LogSoftmax, x, axis)


logsoftmax = log_softmax


def logsumexp(x, axis=None, keepdims=False):
    return tm.logsumexp(x, axis=axis, keepdims=keepdims)


def softmax_grad_legacy(dy, sm):
    return dy * sm - tm.sum(dy * sm, axis=-1, keepdims=True) * sm


def poch(z, m):
    """Pochhammer symbol (rising factorial)."""
    return tm.gamma(z + m) / tm.gamma(z)


def factorial(n):
    return tm.gamma(n + 1)


def beta(a, b):
    return tm.exp(tm.betaln(a, b))


def log_beta(a, b):
    return tm.betaln(a, b)


# x*log(y) family with the 0*log(0) == 0 convention (reference
# tensor/special.py XLogY/XLog1PY scalar ops)
from pytensor_tpu.scalar import math as _psm
from pytensor_tpu.tensor.elemwise import scalar_elemwise as _scalar_elemwise

xlogy = _scalar_elemwise(_psm.xlogy)
xlog1py = _scalar_elemwise(_psm.xlog1py)


def logaddexp(*xs):
    return tm.logaddexp(*xs)
