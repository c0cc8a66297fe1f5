"""Assumptions engine: a static-analysis fact lattice over graphs.

Parallels /root/reference/pytensor/assumptions/ (FactState core.py:13,
AssumptionKey:41, AssumptionFeature:178, register_assumption:127, per-op
rule modules): facts like symmetric / positive-definite / triangular
propagate through op-specific inference rules and feed rewrites (e.g.
generic solve -> triangular solve).
"""

from __future__ import annotations

import enum
from functools import singledispatch
from typing import Callable

from pytensor_tpu.graph.basic import Constant, Variable


class FactState(enum.IntFlag):
    UNKNOWN = 0
    TRUE = 1
    FALSE = 2


# the fact vocabulary (reference per-op rule modules cover the same set)
FACTS = (
    "symmetric",
    "positive_definite",
    "lower_triangular",
    "upper_triangular",
    "diagonal",
    "unit_diagonal",
    "positive",
    "non_negative",
    "orthogonal",
    "zero",
)

_rules: dict = {}


def register_assumption(op_type, fn: Callable):
    """fn(node, fact, holds) -> FactState for node.outputs[0]."""
    _rules.setdefault(op_type, []).append(fn)
    return fn


def assume(var: Variable, *facts: str) -> Variable:
    """Assert facts about a variable (user-provided knowledge)."""
    tagged = getattr(var.tag, "assumptions", None)
    if tagged is None:
        var.tag.assumptions = set()
    for f in facts:
        if f not in FACTS:
            raise ValueError(f"unknown fact {f!r}; choices: {FACTS}")
        var.tag.assumptions.add(f)
    return var


def holds(var: Variable, fact: str, depth: int = 16) -> FactState:
    """Infer whether ``fact`` holds for ``var`` (TRUE / FALSE / UNKNOWN)."""
    if fact in getattr(var.tag, "assumptions", ()):
        return FactState.TRUE
    if depth <= 0 or var.owner is None:
        if isinstance(var, Constant):
            return _constant_fact(var, fact)
        return FactState.UNKNOWN
    node = var.owner
    for op_type, fns in _rules.items():
        if isinstance(node.op, op_type):
            for fn in fns:
                res = fn(node, fact, lambda v, f: holds(v, f, depth - 1))
                if res != FactState.UNKNOWN:
                    return res
    return FactState.UNKNOWN


def _constant_fact(var, fact):
    import numpy as np

    try:
        data = np.asarray(var.data)
    except Exception:
        return FactState.UNKNOWN
    if data.ndim == 2 and data.shape[0] == data.shape[1]:
        if fact == "symmetric":
            return FactState.TRUE if np.allclose(data, data.T) else FactState.FALSE
        if fact == "lower_triangular":
            return FactState.TRUE if np.allclose(data, np.tril(data)) else FactState.FALSE
        if fact == "upper_triangular":
            return FactState.TRUE if np.allclose(data, np.triu(data)) else FactState.FALSE
        if fact == "diagonal":
            return FactState.TRUE if np.allclose(data, np.diag(np.diag(data))) \
                else FactState.FALSE
    if fact == "positive":
        if data.size and (data > 0).all():
            return FactState.TRUE
        return FactState.FALSE if data.size else FactState.UNKNOWN
    if fact == "non_negative":
        if data.size and (data >= 0).all():
            return FactState.TRUE
        return FactState.FALSE if data.size else FactState.UNKNOWN
    if fact == "zero":
        return FactState.TRUE if not data.any() else FactState.FALSE
    return FactState.UNKNOWN


def gram_factor(node):
    """If node computes A @ A^T, return A; else None."""
    from pytensor_tpu.tensor.elemwise import DimShuffle

    x, y = node.inputs[:2]
    def base_of_transpose(v):
        if v.owner is not None and isinstance(v.owner.op, DimShuffle):
            op = v.owner.op
            if op.is_transpose and op.shuffle == tuple(
                    reversed(range(len(op.shuffle)))):
                return v.owner.inputs[0]
        return None
    if base_of_transpose(y) is x:
        return x
    if base_of_transpose(x) is y:
        return y
    return None


def _register_default_rules():
    from pytensor_tpu.tensor.linalg import Cholesky, MatrixInverse
    from pytensor_tpu.tensor.basic import Eye
    from pytensor_tpu.tensor.elemwise import Elemwise
    from pytensor_tpu.tensor.math import Dot

    def cholesky_rule(node, fact, holds_fn):
        op = node.op
        if fact == "lower_triangular":
            return FactState.TRUE if op.lower else FactState.FALSE
        if fact == "upper_triangular":
            return FactState.FALSE if op.lower else FactState.TRUE
        return FactState.UNKNOWN

    register_assumption(Cholesky, cholesky_rule)

    def eye_rule(node, fact, holds_fn):
        if fact in ("diagonal", "symmetric", "lower_triangular",
                    "upper_triangular", "non_negative", "positive_definite",
                    "orthogonal"):
            return FactState.TRUE
        return FactState.UNKNOWN

    register_assumption(Eye, eye_rule)

    from pytensor_tpu.tensor.basic import Alloc

    def alloc_rule(node, fact, holds_fn):
        v = node.inputs[0]
        if fact in ("zero", "non_negative", "positive"):
            return holds_fn(v, fact)
        if fact in ("diagonal", "symmetric", "lower_triangular",
                    "upper_triangular"):
            if holds_fn(v, "zero") == FactState.TRUE and \
                    node.outputs[0].type.ndim == 2:
                return FactState.TRUE
        return FactState.UNKNOWN

    register_assumption(Alloc, alloc_rule)

    def dot_rule(node, fact, holds_fn):
        """Reference assumptions/dot.py: Gram products, triangular and
        diagonal closure under matmul."""
        x, y = node.inputs
        if fact == "diagonal":
            if holds_fn(x, "diagonal") == FactState.TRUE and \
                    holds_fn(y, "diagonal") == FactState.TRUE:
                return FactState.TRUE
        if fact in ("lower_triangular", "upper_triangular"):
            if holds_fn(x, fact) == FactState.TRUE and \
                    holds_fn(y, fact) == FactState.TRUE:
                return FactState.TRUE
        if fact == "orthogonal":
            if holds_fn(x, "orthogonal") == FactState.TRUE and \
                    holds_fn(y, "orthogonal") == FactState.TRUE:
                return FactState.TRUE
        if fact in ("symmetric", "positive_definite"):
            base = gram_factor(node)
            if base is not None:
                if fact == "symmetric":
                    return FactState.TRUE
                # A A^T is PD when A is an (invertible) Cholesky factor or
                # itself assumed PD/orthogonal
                from pytensor_tpu.tensor.linalg import Cholesky

                if base.owner is not None and isinstance(
                        base.owner.op, Cholesky):
                    return FactState.TRUE
                if holds_fn(base, "positive_definite") == FactState.TRUE or \
                        holds_fn(base, "orthogonal") == FactState.TRUE:
                    return FactState.TRUE
        return FactState.UNKNOWN

    register_assumption(Dot, dot_rule)

    try:
        from pytensor_tpu.tensor.blas import Dot22

        register_assumption(Dot22, dot_rule)
    except ImportError:
        pass

    def elemwise_rule(node, fact, holds_fn):
        name = node.op.scalar_op.name
        if fact == "lower_triangular" or fact == "upper_triangular":
            # elementwise product with a triangular matrix keeps the zeros
            if name == "mul":
                for i in node.inputs:
                    if i.type.ndim == node.outputs[0].type.ndim and \
                            holds_fn(i, fact) == FactState.TRUE:
                        return FactState.TRUE
            if name in ("add", "sub", "neg"):
                subs = [holds_fn(i, fact) for i in node.inputs
                        if i.type.ndim == node.outputs[0].type.ndim]
                if subs and all(s == FactState.TRUE for s in subs) and \
                        len(subs) == len(node.inputs):
                    return FactState.TRUE
        if fact == "diagonal":
            if name == "mul":
                for i in node.inputs:
                    if i.type.ndim == node.outputs[0].type.ndim and \
                            holds_fn(i, fact) == FactState.TRUE:
                        return FactState.TRUE
            if name in ("add", "sub", "neg"):
                subs = [holds_fn(i, fact) for i in node.inputs]
                if all(s == FactState.TRUE for s in subs):
                    return FactState.TRUE
        if fact == "symmetric":
            # any elementwise op of symmetric (or scalar) inputs is symmetric
            subs = []
            for i in node.inputs:
                if i.type.ndim == 0:
                    continue
                subs.append(holds_fn(i, "symmetric"))
            if subs and all(s == FactState.TRUE for s in subs):
                return FactState.TRUE
        if fact == "positive":
            if name == "sqrt" or name == "reciprocal":
                return holds_fn(node.inputs[0], "positive")
            if name == "true_div":
                subs = [holds_fn(i, "positive") for i in node.inputs]
                if all(s == FactState.TRUE for s in subs):
                    return FactState.TRUE
            if name in ("exp", "sigmoid", "softplus", "cosh"):
                return FactState.TRUE
            if name == "sqr":
                return FactState.UNKNOWN  # non_negative, not strictly positive
            if name in ("add", "mul"):
                subs = [holds_fn(i, "positive") for i in node.inputs]
                if all(s == FactState.TRUE for s in subs):
                    return FactState.TRUE
        if fact == "non_negative":
            if name in ("exp", "sigmoid", "softplus", "sqr", "abs", "cosh"):
                return FactState.TRUE
            if name in ("add", "mul"):
                subs = [holds_fn(i, "non_negative") for i in node.inputs]
                if all(s == FactState.TRUE for s in subs):
                    return FactState.TRUE
        return FactState.UNKNOWN

    register_assumption(Elemwise, elemwise_rule)

    from pytensor_tpu.tensor.elemwise import DimShuffle

    def dimshuffle_rule(node, fact, holds_fn):
        op = node.op
        (x,) = node.inputs
        if op.is_transpose and op.shuffle == tuple(reversed(range(len(op.shuffle)))):
            if fact == "lower_triangular":
                return holds_fn(x, "upper_triangular")
            if fact == "upper_triangular":
                return holds_fn(x, "lower_triangular")
            if fact in ("symmetric", "diagonal", "positive_definite",
                        "orthogonal", "non_negative", "positive", "zero"):
                return holds_fn(x, fact)
        if not op.drop and not op.shuffle:
            # pure expand_dims of a scalar: value facts pass through
            if fact in ("non_negative", "positive", "zero"):
                return holds_fn(x, fact)
        return FactState.UNKNOWN

    register_assumption(DimShuffle, dimshuffle_rule)

    def inverse_rule(node, fact, holds_fn):
        (x,) = node.inputs
        if fact in ("positive_definite", "diagonal", "symmetric",
                    "lower_triangular", "upper_triangular", "orthogonal"):
            # all preserved under matrix inverse
            return holds_fn(x, fact)
        return FactState.UNKNOWN

    register_assumption(MatrixInverse, inverse_rule)

    from pytensor_tpu.tensor.subtensor import AdvancedSubtensor1

    def perm_rows_rule(node, fact, holds_fn):
        """eye(n)[perm] is a permutation matrix: orthogonal (reference
        assumptions/permutation.py)."""
        x, idx = node.inputs
        if fact != "orthogonal":
            return FactState.UNKNOWN
        if holds_fn(x, "orthogonal") != FactState.TRUE:
            return FactState.UNKNOWN
        if not isinstance(idx, Constant):
            return FactState.UNKNOWN
        import numpy as np

        iv = np.asarray(idx.data)
        n = x.type.shape[0]
        if n is None or iv.ndim != 1 or iv.size != n:
            return FactState.UNKNOWN
        if np.array_equal(np.sort(iv % n), np.arange(n)):
            return FactState.TRUE
        return FactState.UNKNOWN

    register_assumption(AdvancedSubtensor1, perm_rows_rule)

    from pytensor_tpu.tensor.subtensor import AdvancedIncSubtensor

    def set_diag_rule(node, fact, holds_fn):
        """set_subtensor(zeros[ar, ar+k], v): how diag(v) is built.
        k == 0 gives a diagonal (hence symmetric/triangular) matrix."""
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

    register_assumption(AdvancedIncSubtensor, set_diag_rule)

    from pytensor_tpu.tensor.elemwise import CAReduce

    def careduce_rule(node, fact, holds_fn):
        name = node.op.scalar_op.name
        if fact in ("non_negative", "positive") and name in ("add", "mul",
                                                             "maximum"):
            return holds_fn(node.inputs[0], fact)
        return FactState.UNKNOWN

    register_assumption(CAReduce, careduce_rule)


_register_default_rules()


def _register_rewrites():
    """Assumption-driven specializations (reference
    tensor/rewriting/assumptions.py:64 + linalg/solvers.py:703)."""
    from pytensor_tpu.compile.mode import register_specialize
    from pytensor_tpu.graph.rewriting.basic import copy_stack_trace, node_rewriter
    from pytensor_tpu.raise_op import CheckAndRaise
    from pytensor_tpu.tensor.linalg import Solve, SolveTriangular

    @node_rewriter([Solve])
    def local_solve_to_triangular(fgraph, node):
        """solve(L, b) with L known triangular -> solve_triangular."""
        A, b = node.inputs
        if node.op.assume_a != "gen":
            return False
        if holds(A, "lower_triangular") == FactState.TRUE:
            res = SolveTriangular(b_ndim=node.op.b_ndim, lower=True)(A, b)
        elif holds(A, "upper_triangular") == FactState.TRUE:
            res = SolveTriangular(b_ndim=node.op.b_ndim, lower=False)(A, b)
        else:
            return False
        copy_stack_trace(node.outputs[0], res)
        return [res]

    register_specialize(local_solve_to_triangular, name="local_solve_to_triangular")

    @node_rewriter([Solve])
    def local_solve_to_cholesky(fgraph, node):
        """solve(A, b) with A known positive-definite -> the Cholesky path
        (reference linalg/solvers.py:703 psd specialization)."""
        A, b = node.inputs
        if node.op.assume_a != "gen":
            return False
        if holds(A, "positive_definite") != FactState.TRUE:
            return False
        res = Solve(assume_a="pos", b_ndim=node.op.b_ndim)(A, b)
        copy_stack_trace(node.outputs[0], res)
        return [res]

    register_specialize(local_solve_to_cholesky, name="local_solve_to_cholesky")

    @node_rewriter([CheckAndRaise])
    def local_remove_proven_assert(fgraph, node):
        """Drop asserts whose condition is a proven fact."""
        value, *conds = node.inputs
        remaining = []
        for c in conds:
            if holds(c, "positive") == FactState.TRUE:
                continue
            remaining.append(c)
        if len(remaining) == len(conds):
            return False
        if not remaining:
            return [value]
        return [type(node.op)(node.op.exc_type, node.op.msg)(value, *remaining)]

    register_specialize(local_remove_proven_assert, name="local_remove_proven_assert")


_register_rewrites()
