"""debugprint and friends.

Parallels /root/reference/pytensor/printing.py (debugprint:532, Print
op:1494, pydotprint:1948 — dot export provided via ``pydotprint`` when
pydot is installed).
"""

from __future__ import annotations

import sys
from io import StringIO
from typing import Any

from pytensor_tpu.graph.basic import Apply, Constant, Variable
from pytensor_tpu.graph.fg import FunctionGraph
from pytensor_tpu.graph.op import HasInnerGraph, Op


def debugprint(
    graph_like,
    depth: int = -1,
    print_type: bool = False,
    file=None,
    id_type: str = "CHAR",
    stop_on_name: bool = False,
    done=None,
    print_storage: bool = False,
    used_ids=None,
    print_op_info: bool = False,
    print_destroy_map: bool = False,
    print_view_map: bool = False,
    print_fgraph_inputs: bool = False,
):
    """Print a graph as an indented tree; returns the stream."""
    _file = StringIO() if file == "str" else (file or sys.stdout)
    if done is None:
        done = set()
    if used_ids is None:
        used_ids = {}

    results = []
    if isinstance(graph_like, FunctionGraph):
        if print_fgraph_inputs:
            for i in graph_like.inputs:
                _print_var(i, "→ ", 0, depth, print_type, _file, done, used_ids)
        results = graph_like.outputs
    elif isinstance(graph_like, Variable):
        results = [graph_like]
    elif isinstance(graph_like, Apply):
        results = graph_like.outputs
    elif hasattr(graph_like, "fgraph"):
        results = graph_like.fgraph.outputs
    elif isinstance(graph_like, (list, tuple)):
        for g in graph_like:
            debugprint(g, depth=depth, print_type=print_type, file=_file,
                       done=done, used_ids=used_ids)
        if file == "str":
            return _file.getvalue()
        return _file
    else:
        raise TypeError(f"debugprint cannot handle {type(graph_like)}")

    for r in results:
        _print_var(r, "", 0, depth, print_type, _file, done, used_ids)
    # inner graphs
    inner_seen = set()
    for r in results:
        _print_inner_graphs(r, depth, print_type, _file, done, used_ids, inner_seen)
    if file == "str":
        return _file.getvalue()
    return _file


def _id_of(obj, used_ids):
    if obj not in used_ids:
        used_ids[obj] = f"id {len(used_ids)}"
    return used_ids[obj]


def _print_var(var, prefix, level, depth, print_type, file, done, used_ids):
    indent = " " * (2 * level)
    type_str = f" <{var.type}>" if print_type else ""
    if var.owner is None:
        print(f"{indent}{prefix}{var}{type_str}", file=file)
        return
    node = var.owner
    op_str = str(node.op)
    out_idx = f".{var.index}" if len(node.outputs) > 1 else ""
    node_id = _id_of(node, used_ids)
    name_str = f" '{var.name}'" if var.name else ""
    print(f"{indent}{prefix}{op_str}{out_idx} [{node_id}]{name_str}{type_str}",
          file=file)
    if node in done:
        return
    done.add(node)
    if depth == 0:
        return
    for i in node.inputs:
        _print_var(i, "├─ " if i is not node.inputs[-1] else "└─ ",
                   level + 1, depth - 1, print_type, file, done, used_ids)


def _print_inner_graphs(var, depth, print_type, file, done, used_ids, seen):
    from pytensor_tpu.graph.traversal import applys_between

    for node in applys_between([], [var]):
        op = node.op
        if isinstance(op, HasInnerGraph) and id(op) not in seen:
            seen.add(id(op))
            print(f"\nInner graphs of {op}:", file=file)
            for out in op.inner_outputs:
                _print_var(out, " ", 1, depth, print_type, file, set(), used_ids)


dprint = debugprint


class Print(Op):
    """Eager-print op: prints its input value at runtime, passes it through.
    XLA lowering uses jax.debug.print."""

    view_map = {0: [0]}
    __props__ = ("message", "attrs")

    def __init__(self, message="", attrs=("__str__",), global_fn=None):
        self.message = message
        self.attrs = tuple(attrs)

    def make_node(self, x):
        from pytensor_tpu.tensor.basic import as_tensor_variable

        x = as_tensor_variable(x)
        return Apply(self, [x], [x.type()])

    def perform(self, node, inputs, output_storage):
        (x,) = inputs
        for attr in self.attrs:
            if attr == "__str__":
                print(f"{self.message} {x}")
            else:
                print(f"{self.message} {attr} = {getattr(x, attr)()}")
        output_storage[0][0] = x

    def infer_shape(self, fgraph, node, input_shapes):
        return input_shapes

    def L_op(self, inputs, outputs, output_grads):
        return output_grads


def pydotprint(graph_like, outfile=None, format="png", **kwargs):
    """Graphviz export of a graph (requires pydot)."""
    try:
        import pydot
    except ImportError as e:
        raise ImportError("pydotprint requires pydot") from e
    g = pydot.Dot(graph_type="digraph")
    if isinstance(graph_like, FunctionGraph):
        outputs = graph_like.outputs
    elif isinstance(graph_like, Variable):
        outputs = [graph_like]
    else:
        outputs = list(graph_like)
    from pytensor_tpu.graph.traversal import applys_between

    nodes = list(applys_between([], outputs))
    names = {}

    def nm(obj, label):
        if id(obj) not in names:
            names[id(obj)] = f"n{len(names)}"
            g.add_node(pydot.Node(names[id(obj)], label=label))
        return names[id(obj)]

    for node in nodes:
        an = nm(node, str(node.op))
        for i in node.inputs:
            vn = nm(i, str(i))
            g.add_edge(pydot.Edge(vn, an))
        for o in node.outputs:
            vn = nm(o, str(o))
            g.add_edge(pydot.Edge(an, vn))
    if outfile:
        g.write(outfile, format=format)
    return g


def char_from_number(n):
    chars = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
    res = ""
    while True:
        res = chars[n % 26] + res
        n //= 26
        if n == 0:
            return res
