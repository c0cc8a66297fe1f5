"""Memory aliasing contracts.

Parallels /root/reference/pytensor/compile/aliasing.py (Supervisor:75,
insert_deepcopy:165, infer_reuse_pattern:55).  On the XLA runtime arrays
are immutable, so the borrow/deepcopy machinery reduces to donation
policy; the Supervisor remains meaningful for the oracle VM, where ops
*may* declare destroy_map.
"""

from __future__ import annotations

from pytensor_tpu.graph.basic import Variable
from pytensor_tpu.graph.features import AlreadyThere, Feature


class Supervisor(Feature):
    """Forbid destruction of protected variables (non-mutable inputs)."""

    def __init__(self, protected):
        self.protected = list(protected)

    def on_attach(self, fgraph):
        if hasattr(fgraph, "_supervisor"):
            raise AlreadyThere()
        fgraph._supervisor = self

    def validate(self, fgraph):
        for node in fgraph.apply_nodes:
            dmap = getattr(node.op, "destroy_map", None)
            if not dmap:
                continue
            for _, in_idxs in dmap.items():
                for idx in in_idxs:
                    if node.inputs[idx] in self.protected:
                        raise Exception(
                            f"Supervisor: {node} destroys protected input "
                            f"{node.inputs[idx]}"
                        )


def add_supervisor_to_fgraph(fgraph, input_specs, accept_inplace=False):
    protected = [
        spec.variable if hasattr(spec, "variable") else spec
        for spec in input_specs
        if not getattr(spec, "mutable", False)
    ]
    fgraph.attach_feature(Supervisor(protected))
    return fgraph


def infer_reuse_pattern(fgraph, outputs_to_disown):
    """Variables whose storage may alias a given output (view chains)."""
    seen = set()
    frontier = list(outputs_to_disown)
    while frontier:
        v = frontier.pop()
        if v in seen or v.owner is None:
            continue
        seen.add(v)
        vmap = getattr(v.owner.op, "view_map", None) or {}
        idx = v.owner.outputs.index(v)
        for in_idx in vmap.get(idx, ()):
            frontier.append(v.owner.inputs[in_idx])
    return seen


def insert_deepcopy(fgraph, wrapped_inputs, wrapped_outputs):
    """No-op on the XLA runtime (immutable arrays); kept for API parity.

    The reference inserts DeepCopyOp between aliased outputs and shared
    storage (compile/aliasing.py:165); with jax arrays a returned output
    can never be mutated in place by a later call, so the copy is never
    needed.  The oracle VM returns fresh arrays from each perform.
    """
    return fgraph


def alias_root(var):
    """Storage root of a view chain (reference compile/function naming;
    same analysis as graph.destroyhandler.view_root)."""
    from pytensor_tpu.graph.destroyhandler import view_root

    return view_root(var)


def view_tree_set(fgraph, var):
    """Every live alias of ``var``'s storage root."""
    from pytensor_tpu.graph.destroyhandler import _aliases_of, view_root

    return _aliases_of(fgraph, view_root(var))
