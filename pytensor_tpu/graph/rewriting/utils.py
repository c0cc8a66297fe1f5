"""Driver helpers: apply rewrite queries to loose variables.

Parallels /root/reference/pytensor/graph/rewriting/utils.py
(rewrite_graph).
"""

from __future__ import annotations

from pytensor_tpu.graph.basic import Variable
from pytensor_tpu.graph.fg import FunctionGraph


def rewrite_graph(
    graph,
    include=("canonicalize",),
    custom_rewrite=None,
    clone=False,
    **kwargs,
):
    """Apply the optdb query selected by ``include`` tags to a graph
    (a Variable, list of Variables, or FunctionGraph)."""
    from pytensor_tpu.compile.mode import optdb
    from pytensor_tpu.graph.rewriting.db import RewriteDatabaseQuery

    return_fgraph = isinstance(graph, FunctionGraph)
    if return_fgraph:
        fgraph = graph
        one = False
    else:
        one = isinstance(graph, Variable)
        outputs = [graph] if one else list(graph)
        fgraph = FunctionGraph(outputs=outputs, clone=clone)

    if custom_rewrite is not None:
        custom_rewrite.rewrite(fgraph)
    else:
        query = RewriteDatabaseQuery(include=include, **kwargs)
        optdb.query(query).rewrite(fgraph)

    if return_fgraph:
        return fgraph
    return fgraph.outputs[0] if one else fgraph.outputs
