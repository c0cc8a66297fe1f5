"""Optional miniKanren relational-rewriting bridge.

Parallels /root/reference/pytensor/graph/rewriting/kanren.py
(KanrenRelationSub:243).  The miniKanren package is optional; without it
this module exposes a clear error at use time (the reference treats it
the same way).
"""

from __future__ import annotations

from pytensor_tpu.graph.rewriting.basic import NodeRewriter

try:
    from kanren import run  # type: ignore

    HAS_KANREN = True
except ImportError:
    HAS_KANREN = False


class KanrenRelationSub(NodeRewriter):
    """Node rewriter driven by a miniKanren relation over (in, out) terms."""

    def __init__(self, relation, node_filter=None, name=None):
        if not HAS_KANREN:
            raise ImportError(
                "KanrenRelationSub requires the miniKanren package "
                "(not installed in this environment)"
            )
        self.relation = relation
        self.node_filter = node_filter
        self.name = name or "KanrenRelationSub"

    def transform(self, fgraph, node):
        from kanren import var

        if self.node_filter is not None and not self.node_filter(node):
            return False
        out = node.outputs[0]
        q = var()
        results = run(1, q, self.relation(out, q))
        if not results:
            return False
        return [results[0]]
