"""Structural-op assumption rules: Eye/Alloc/diag construction,
permutation rows, shape ops and value-fact passthrough (reference
assumptions/{alloc,permutation,diagonal,specify,reshape,subtensor}.py).
"""

from __future__ import annotations

import numpy as np

from pytensor_tpu.assumptions import FactState, register_assumption
from pytensor_tpu.graph.basic import Constant
from pytensor_tpu.tensor.basic import Alloc, Eye, Join, MakeVector
from pytensor_tpu.tensor.shape import Reshape, SpecifyShape
from pytensor_tpu.tensor.subtensor import (
    AdvancedIncSubtensor,
    AdvancedSubtensor1,
    Subtensor,
)

_VALUE_FACTS = ("positive", "non_negative", "zero")


def eye_rule(node, fact, holds_fn):
    if fact in ("diagonal", "symmetric", "lower_triangular",
                "upper_triangular", "non_negative", "positive_definite",
                "orthogonal"):
        return FactState.TRUE
    if fact == "permutation":
        # eye(n, m, k) is a permutation matrix only for the square
        # main-diagonal form; k is inputs[2] when constructed by eye().
        k = node.inputs[2] if len(node.inputs) > 2 else None
        n, m = node.outputs[0].type.shape
        if n is not None and m is not None and n == m and \
                isinstance(k, Constant) and int(k.data) == 0:
            return FactState.TRUE
        return FactState.UNKNOWN
    return FactState.UNKNOWN


def alloc_rule(node, fact, holds_fn):
    v = node.inputs[0]
    if fact in _VALUE_FACTS:
        return holds_fn(v, fact)
    if fact in ("diagonal", "symmetric", "lower_triangular",
                "upper_triangular"):
        if holds_fn(v, "zero") == FactState.TRUE and \
                node.outputs[0].type.ndim == 2:
            return FactState.TRUE
    return FactState.UNKNOWN


def perm_rows_rule(node, fact, holds_fn):
    """P[perm] for a permutation matrix P (e.g. eye(n)[perm]) is again a
    permutation matrix: permutation + orthogonal (reference
    assumptions/permutation.py)."""
    x, idx = node.inputs
    if fact in ("orthogonal", "permutation"):
        base = "permutation" if fact == "permutation" else "orthogonal"
        if holds_fn(x, base) != FactState.TRUE:
            return FactState.UNKNOWN
        if not isinstance(idx, Constant):
            return FactState.UNKNOWN
        iv = np.asarray(idx.data)
        n = x.type.shape[0]
        if n is None or iv.ndim != 1 or iv.size != n:
            return FactState.UNKNOWN
        if np.array_equal(np.sort(iv % n), np.arange(n)):
            return FactState.TRUE
        return FactState.UNKNOWN
    if fact in _VALUE_FACTS:
        return holds_fn(x, fact)
    return FactState.UNKNOWN


def set_diag_rule(node, fact, holds_fn):
    """set_subtensor(zeros[ar, ar], v): how diag(v) is built — diagonal
    (hence symmetric/triangular)."""
    if fact in _VALUE_FACTS:
        x, y, *_ = node.inputs
        if holds_fn(x, "zero") == FactState.TRUE and fact == "non_negative":
            return holds_fn(y, "non_negative")
        return FactState.UNKNOWN
    if fact not in ("diagonal", "symmetric", "lower_triangular",
                    "upper_triangular"):
        return FactState.UNKNOWN
    op = node.op
    if not getattr(op, "set_instead_of_inc", False):
        return FactState.UNKNOWN
    x, y, *indices = node.inputs
    if holds_fn(x, "zero") != FactState.TRUE:
        return FactState.UNKNOWN
    if len(indices) != 2:
        return FactState.UNKNOWN
    r, c = indices
    if r is c:  # literally the same arange: the main diagonal
        return FactState.TRUE
    return FactState.UNKNOWN


def value_passthrough_rule(node, fact, holds_fn):
    """Shape-only ops preserve elementwise value facts (reference
    assumptions/{specify,reshape,subtensor}.py)."""
    if fact not in _VALUE_FACTS:
        return FactState.UNKNOWN
    return holds_fn(node.inputs[0], fact)


def joinlike_value_rule(node, fact, holds_fn):
    if fact not in _VALUE_FACTS:
        return FactState.UNKNOWN
    data = node.inputs[1:] if isinstance(node.op, Join) else node.inputs
    subs = [holds_fn(i, fact) for i in data]
    if subs and all(s == FactState.TRUE for s in subs):
        return FactState.TRUE
    return FactState.UNKNOWN


register_assumption(Eye, eye_rule)
register_assumption(Alloc, alloc_rule)
register_assumption(AdvancedSubtensor1, perm_rows_rule)
register_assumption(AdvancedIncSubtensor, set_diag_rule)
register_assumption(SpecifyShape, value_passthrough_rule)
register_assumption(Reshape, value_passthrough_rule)
register_assumption(Subtensor, value_passthrough_rule)
register_assumption(Join, joinlike_value_rule)
register_assumption(MakeVector, joinlike_value_rule)
