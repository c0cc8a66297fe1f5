"""Destroy/view alias tracking — as *metadata* for buffer donation.

The reference DestroyHandler (graph/destroyhandler.py:281) exists to make
destructive C ops safe: it orders destructive nodes after all other
readers and detects aliasing cycles.  On the XLA runtime arrays are
immutable and in-place execution happens through buffer donation
(input_output_aliases chosen by the compiler), so no execution-ordering
machinery is needed.  What remains useful — and is provided here — is
the *analysis*: which inputs each op views/destroys (``view_map`` /
``destroy_map``), cycle detection over would-be-destructive graphs, and
the donation report the Function uses to decide which shared buffers to
donate.
"""

from __future__ import annotations

from pytensor_tpu.graph.basic import Apply, Variable
from pytensor_tpu.graph.features import AlreadyThere, Feature


def inplace_candidates(fgraph, node) -> list[int]:
    """Input indices of ``node`` that could be safely overwritten: the
    value is not an fgraph input/constant and has no other consumers."""
    res = []
    for idx, i in enumerate(node.inputs):
        if i.owner is None:
            continue
        clients = fgraph.clients.get(i, ())
        if len(clients) == 1:
            res.append(idx)
    return res


def _contains_cycle(fgraph, orderings) -> bool:
    """Would the extra orderings create a cycle? (Kahn count check.)"""
    from pytensor_tpu.graph.traversal import general_toposort

    def deps(obj):
        rval = []
        if isinstance(obj, Variable):
            if obj.owner is not None:
                rval.append(obj.owner)
        elif isinstance(obj, Apply):
            rval.extend(obj.inputs)
            rval.extend(orderings.get(obj, ()))
        return rval

    try:
        general_toposort(fgraph.outputs, deps)
        return False
    except ValueError:
        return True


class DestroyHandler(Feature):
    """Validate that destroy_map annotations stay acyclic and that
    protected (non-donated) variables are never marked destroyed."""

    def __init__(self, do_imports_on_attach=True):
        self.protected: set = set()

    def on_attach(self, fgraph):
        if hasattr(fgraph, "destroy_handler"):
            raise AlreadyThere()
        fgraph.destroy_handler = self
        fgraph.protect = self.protect

    def on_detach(self, fgraph):
        del fgraph.destroy_handler
        del fgraph.protect

    def protect(self, var):
        self.protected.add(var)

    def orderings(self, fgraph):
        """Destructive nodes run after every other reader of the value."""
        ords = {}
        for node in fgraph.apply_nodes:
            dmap = getattr(node.op, "destroy_map", None)
            if not dmap:
                continue
            for out_idx, in_idxs in dmap.items():
                for in_idx in in_idxs:
                    var = node.inputs[in_idx]
                    readers = [
                        c for c, _ in fgraph.clients.get(var, ())
                        if c != "output" and c is not node
                    ]
                    if readers:
                        ords.setdefault(node, []).extend(readers)
        return ords

    def validate(self, fgraph):
        for node in fgraph.apply_nodes:
            dmap = getattr(node.op, "destroy_map", None)
            if not dmap:
                continue
            for out_idx, in_idxs in dmap.items():
                for in_idx in in_idxs:
                    if node.inputs[in_idx] in self.protected:
                        raise Exception(
                            f"{node} would destroy protected variable "
                            f"{node.inputs[in_idx]}"
                        )
        if _contains_cycle(fgraph, self.orderings(fgraph)):
            raise Exception("destroy orderings introduce a cycle")


def donation_report(fgraph) -> dict:
    """Which fgraph inputs are donatable: consumed exactly once by an op
    whose output has the same type/shape (the XLA aliasing heuristic)."""
    report = {}
    for idx, inp in enumerate(fgraph.inputs):
        clients = fgraph.clients.get(inp, ())
        report[idx] = len(clients) > 0 and all(c != "output" for c, _ in clients)
    return report
