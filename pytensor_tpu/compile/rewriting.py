"""Inner-graph rewriting bridge.

Parallels /root/reference/pytensor/compile/rewriting.py
(rewrite_ofg_inner_graph:129, inline_ofg_expansion:203 — the inline pass
itself is registered from compile/builders.py): run the active rewrite
pipeline INSIDE HasInnerGraph ops (OpFromGraph, Scan) so stabilizations
reach loop bodies and composites.
"""

from __future__ import annotations

from pytensor_tpu.compile.mode import optdb
from pytensor_tpu.graph.op import HasInnerGraph
from pytensor_tpu.graph.rewriting.basic import GraphRewriter
from pytensor_tpu.graph.rewriting.db import RewriteDatabaseQuery


class RewriteInnerGraphs(GraphRewriter):
    """Apply a (cheap, stable) rewrite query to every inner graph."""

    name = "rewrite_inner_graphs"

    def __init__(self, include=("fast_run",),
                 exclude=("fusion", "inplace", "scan", "inner_unsafe",
                          "rewrite_inner_graphs")):  # no recursive self-application
        self.include = include
        self.exclude = exclude

    def apply(self, fgraph):
        from pytensor_tpu.compile.builders import OpFromGraph
        from pytensor_tpu.scan.op import Scan

        query = RewriteDatabaseQuery(include=self.include, exclude=self.exclude)
        rewriter = optdb.query(query)
        seen = set()
        count = 0
        for node in list(fgraph.apply_nodes):
            op = node.op
            if not isinstance(op, HasInnerGraph) or id(op) in seen:
                continue
            seen.add(id(op))
            if not isinstance(op, (OpFromGraph, Scan)):
                continue
            try:
                rewriter.rewrite(op.fgraph)
                if hasattr(op, "_oracle_fn"):
                    op._oracle_fn = None  # recompile the oracle after rewrites
                count += 1
            except Exception:
                continue
        return count


optdb.register(
    "rewrite_inner_graphs",
    RewriteInnerGraphs(),
    "fast_run",
    position=49.6,  # reference ofg_inner_graph position
)
