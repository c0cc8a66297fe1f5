"""Shared test harness utilities.

Parallels the reference's tests/unittest_tools.py + tests/tensor/utils.py
and the backend-parity pattern of tests/link/jax/test_basic.py:36
(``compare_jax_and_py``): compile the same graph with the XLA linker and
with the numpy oracle (PerformLinker) and compare numerics.
"""

from __future__ import annotations

import numpy as np

import pytensor_tpu as ptt
from pytensor_tpu.graph.traversal import explicit_graph_inputs


def compare_xla_and_py(inputs, outputs, test_values, *, rtol=1e-6, atol=1e-8,
                       must_be_device=False):
    """Compile with XLA and the oracle, assert outputs match."""
    one = not isinstance(outputs, (list, tuple))
    outs = [outputs] if one else list(outputs)
    f_xla = ptt.function(inputs, outs, mode="FAST_RUN", on_unused_input="ignore")
    f_py = ptt.function(inputs, outs, mode="FAST_COMPILE", on_unused_input="ignore")
    res_xla = f_xla(*test_values)
    res_py = f_py(*test_values)
    for rx, rp in zip(res_xla, res_py):
        rx = np.asarray(rx)
        rp = np.asarray(rp)
        assert rx.shape == rp.shape, f"shape mismatch: {rx.shape} vs {rp.shape}"
        assert str(rx.dtype) == str(rp.dtype), f"dtype mismatch: {rx.dtype} vs {rp.dtype}"
        np.testing.assert_allclose(rx, rp, rtol=rtol, atol=atol)
    return res_xla


def assert_equal_computations(xs, ys, in_xs=None, in_ys=None):
    """Structural graph equality (reference unittest_tools.py:288)."""
    from pytensor_tpu.graph.basic import Constant

    def eq(a, b, memo):
        if (id(a), id(b)) in memo:
            return True
        memo.add((id(a), id(b)))
        if isinstance(a, Constant) and isinstance(b, Constant):
            return a.equals(b)
        if (a.owner is None) != (b.owner is None):
            return False
        if a.owner is None:
            if in_xs is not None and a in in_xs:
                return b in in_ys and in_xs.index(a) == in_ys.index(b)
            return a is b
        if a.owner.op != b.owner.op:
            return False
        if len(a.owner.inputs) != len(b.owner.inputs):
            return False
        if a.index != b.index:
            return False
        return all(eq(ai, bi, memo) for ai, bi in zip(a.owner.inputs, b.owner.inputs))

    memo = set()
    assert len(xs) == len(ys)
    for x, y in zip(xs, ys):
        assert eq(x, y, memo), f"computations differ: {x} vs {y}"
