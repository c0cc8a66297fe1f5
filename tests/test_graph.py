"""Graph-core tests (modeled on reference tests/graph/ semantics)."""

import numpy as np
import pytest

import pytensor_tpu as ptt
import pytensor_tpu.tensor as pt
from pytensor_tpu.graph.basic import Apply, Constant, Variable, clone
from pytensor_tpu.graph.fg import FunctionGraph, MissingInputError
from pytensor_tpu.graph.traversal import (
    ancestors,
    applys_between,
    explicit_graph_inputs,
    graph_inputs,
    io_toposort,
    vars_between,
)
from pytensor_tpu.graph.replace import clone_replace, graph_replace


def test_variable_basics():
    x = pt.dvector("x")
    assert x.name == "x"
    assert x.owner is None
    assert x.type.dtype == "float64"
    assert x.ndim == 1


def test_apply_structure():
    x = pt.dvector("x")
    y = pt.dvector("y")
    z = x + y
    assert z.owner is not None
    assert len(z.owner.inputs) == 2
    assert z.owner.inputs[0] is x
    assert z.owner.outputs[0] is z
    assert z.index == 0


def test_graph_inputs_and_ancestors():
    x = pt.dvector("x")
    y = pt.dvector("y")
    z = (x + y) * x
    inputs = list(graph_inputs([z]))
    assert x in inputs and y in inputs
    anc = list(ancestors([z]))
    assert x in anc and (x + y).owner is not None


def test_toposort_order():
    x = pt.dvector("x")
    a = x + 1
    b = a * 2
    c = a + b
    order = io_toposort([x], [c])
    assert order.index(a.owner) < order.index(b.owner)
    assert order.index(b.owner) < order.index(c.owner)


def test_clone_independent():
    x = pt.dvector("x")
    y = x * 2
    ins, outs = clone([x], [y])
    assert ins[0] is not x
    assert outs[0] is not y
    assert outs[0].owner.op == y.owner.op


def test_clone_replace():
    x = pt.dvector("x")
    y = pt.dvector("y")
    z = x + 1
    z2 = clone_replace(z, {x: y})
    f = ptt.function([y], z2, mode="FAST_COMPILE")
    np.testing.assert_allclose(f(np.zeros(2)), [1, 1])


def test_graph_replace_intermediate():
    x = pt.dvector("x")
    mid = pt.exp(x)
    out = mid + 1
    # replace the *intermediate* exp(x) with x itself
    out2 = graph_replace(out, {mid: x})
    f = ptt.function([x], out2, mode="FAST_COMPILE")
    np.testing.assert_allclose(f(np.array([3.0])), [4.0])


def test_fgraph_clients_and_replace():
    x = pt.dvector("x")
    y = x * 2
    z = y + 3
    fg = FunctionGraph([x], [z], clone=False)
    assert (y.owner, 0) in fg.clients[x]
    new_y = x + 100
    fg.replace(y, new_y, reason="test")
    fg.check_integrity()
    assert z.owner.inputs[0] is new_y


def test_fgraph_missing_input():
    x = pt.dvector("x")
    y = pt.dvector("y")
    z = x + y
    with pytest.raises(MissingInputError):
        FunctionGraph([x], [z], clone=False)


def test_fgraph_replace_validate_revert():
    x = pt.dvector("x")
    z = x * 2
    fg = FunctionGraph([x], [z], clone=False)
    chk = fg.checkpoint()
    fg.replace(z, x + 7, reason="t")
    fg.revert(chk)
    assert fg.outputs[0] is z


def test_constant_equality_merge():
    c1 = pt.constant(np.array([1.0, 2.0]))
    c2 = pt.constant(np.array([1.0, 2.0]))
    assert c1.equals(c2)
    assert c1.signature() == c2.signature()


def test_vars_between():
    x = pt.dvector("x")
    a = x + 1
    b = a * 2
    vs = list(vars_between([x], [b]))
    assert a in vs and b in vs


def test_eval():
    x = pt.dscalar("x")
    y = x * 2 + 1
    assert float(y.eval({x: 2.0})) == 5.0
