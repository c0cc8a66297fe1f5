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
    """Apply the active mode's rewrite query to every inner graph.

    ``wants_query``: when selected from the optdb, ``bind_query`` hands
    this rewriter the query it was selected under, so mode extensions
    (e.g. ``mode.including("onehot_gather")``) reach loop bodies — the
    reference's scan inner-graph bridge semantics
    (scan/rewriting/db.py:260-265)."""

    name = "rewrite_inner_graphs"
    wants_query = True

    # never applied inside inner graphs recursively; fusion/inplace are
    # backend-pass concerns that must not run early on inner graphs
    BASE_EXCLUDE = ("fusion", "inplace", "scan", "inner_unsafe",
                    "rewrite_inner_graphs")

    def __init__(self, include=("fast_run",), exclude=BASE_EXCLUDE):
        self.include = tuple(include)
        self.exclude = tuple(exclude)

    def bind_query(self, query):
        return RewriteInnerGraphs(
            include=tuple(query.include),
            exclude=tuple(set(self.BASE_EXCLUDE) | set(query.exclude)),
        )

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
