"""OpFromGraph: encapsulate a subgraph as a single Op.

Parallels /root/reference/pytensor/compile/builders.py (OpFromGraph:116,
construct_nominal_fgraph:67).  Used as the base of Softmax/Pad/Einsum-
style composite ops (reference SymbolicOp:885) and by the fusion pass.
The XLA lowering recursively traces the inner graph, so XLA sees the
flattened computation either way; ``inline`` only affects graph-level
rewriting visibility.
"""

from __future__ import annotations

from typing import Sequence

from pytensor_tpu.graph.basic import Apply, Constant, Variable, clone
from pytensor_tpu.graph.fg import FunctionGraph
from pytensor_tpu.graph.null_type import DisconnectedType, NullType
from pytensor_tpu.graph.op import HasInnerGraph, Op
from pytensor_tpu.graph.traversal import graph_inputs


class OpFromGraph(Op, HasInnerGraph):
    """An Op wrapping inputs->outputs of an inner graph."""

    def __init__(self, inputs: Sequence[Variable], outputs: Sequence[Variable],
                 inline: bool = False, lop_overrides=None, grad_overrides=None,
                 rop_overrides=None, connection_pattern=None, name=None,
                 destroy_map=None, **kwargs):
        if not isinstance(outputs, (list, tuple)):
            raise TypeError("outputs must be a list")
        for i in inputs:
            if isinstance(i, Constant):
                raise TypeError("OpFromGraph inputs cannot be constants")
        # clone to protect the inner graph from outer mutation
        new_inputs, new_outputs = clone(list(inputs), list(outputs))
        self.fgraph = FunctionGraph(new_inputs, new_outputs, clone=False)
        self.inline = inline
        self.name = name
        self.lop_overrides = lop_overrides if lop_overrides is not None else grad_overrides
        self.rop_overrides = rop_overrides
        self._connection_pattern = connection_pattern
        self.kwargs = kwargs
        self.input_types = [i.type for i in new_inputs]
        self.output_types = [o.type for o in new_outputs]
        self._oracle_fn = None

    def __eq__(self, other):
        return self is other

    def __hash__(self):
        return id(self)

    def __getstate__(self):
        # the inner FunctionGraph may carry Feature-injected local
        # lambdas (History checkpoints, validators) and the compiled
        # oracle closure — neither pickles.  Persist the inner graph as
        # (inputs, outputs) and rebuild a fresh fgraph on load (rewrites
        # re-run at the next compile anyway).
        d = self.__dict__.copy()
        d["_oracle_fn"] = None
        d["fgraph"] = (list(self.fgraph.inputs), list(self.fgraph.outputs))
        return d

    def __setstate__(self, d):
        ins, outs = d.pop("fgraph")
        self.__dict__.update(d)
        self.fgraph = FunctionGraph(ins, outs, clone=False)

    @property
    def fn(self):
        return self._make_oracle()

    def _make_oracle(self):
        if self._oracle_fn is None:
            from pytensor_tpu.link.basic import PerformLinker

            linker = PerformLinker().accept(self.fgraph)
            run, input_storage, output_storage = linker.make_thunk()

            def fn(*vals):
                for s, v in zip(input_storage, vals):
                    s[0] = v
                return run()

            self._oracle_fn = fn
        return self._oracle_fn

    def make_node(self, *inputs):
        if len(inputs) != len(self.fgraph.inputs):
            raise ValueError(
                f"{self} expected {len(self.fgraph.inputs)} inputs, got {len(inputs)}"
            )
        inputs = [t.filter_variable(i) for t, i in zip(self.input_types, inputs)]
        return Apply(self, list(inputs), [t() for t in self.output_types])

    def perform(self, node, inputs, output_storage):
        res = self._make_oracle()(*inputs)
        for s, r in zip(output_storage, res):
            s[0] = r

    def infer_shape(self, fgraph, node, input_shapes):
        raise NotImplementedError()

    def connection_pattern(self, node):
        if self._connection_pattern is not None:
            return self._connection_pattern
        return super().connection_pattern(node)

    def L_op(self, inputs, outputs, output_grads):
        from pytensor_tpu.gradient import pullback
        from pytensor_tpu.graph.basic import clone_get_equiv

        if self.lop_overrides is not None:
            return self.lop_overrides(inputs, output_grads)
        # inline the inner graph on the outer inputs, then pull back
        memo = {i_inner: i_outer for i_inner, i_outer in
                zip(self.fgraph.inputs, inputs)}
        memo = clone_get_equiv(self.fgraph.inputs, self.fgraph.outputs,
                               copy_inputs=False, copy_orphans=False, memo=memo)
        inlined_outputs = [memo[o] for o in self.fgraph.outputs]
        return pullback(inlined_outputs, list(inputs), output_grads,
                        disconnected_inputs="ignore", return_disconnected="disconnected")

    def R_op(self, inputs, eval_points):
        from pytensor_tpu.gradient import Rop_via_pushforward

        if self.rop_overrides is not None:
            return self.rop_overrides(inputs, eval_points)
        return Rop_via_pushforward(self, inputs, eval_points)

    @property
    def inner_inputs(self):
        return self.fgraph.inputs

    @property
    def inner_outputs(self):
        return self.fgraph.outputs

    def clone(self):
        import copy as _copy

        res = _copy.copy(self)
        res.fgraph = self.fgraph.clone()
        res._oracle_fn = None
        return res

    def __str__(self):
        return self.name or f"OpFromGraph{{{id(self):x}}}"


class SymbolicOp(OpFromGraph):
    """OpFromGraph subclass auto-built from a ``symbolic_call`` classmethod
    (reference compile/builders.py:885): used by Softmax/Pad/Einsum-style
    named composites so rewrites can track them as single ops."""

    __symbolic_props__: tuple = ()

    def __init__(self, *inputs, **params):
        for k, v in params.items():
            setattr(self, k, v)
        outputs = self.symbolic_call(*inputs)
        if not isinstance(outputs, (list, tuple)):
            outputs = [outputs]
        super().__init__(list(inputs), list(outputs),
                         name=type(self).__name__)

    def symbolic_call(self, *inputs):
        raise NotImplementedError


def construct_nominal_fgraph(inputs, outputs):
    """Reference-compat helper: clone a subgraph into a standalone fgraph."""
    new_inputs, new_outputs = clone(list(inputs), list(outputs))
    return FunctionGraph(new_inputs, new_outputs, clone=False)


# --- rewrites: inline is_inline OpFromGraphs --------------------------------

def _register_inline_rewrite():
    from pytensor_tpu.compile.mode import optdb
    from pytensor_tpu.graph.rewriting.basic import WalkingGraphRewriter, node_rewriter

    @node_rewriter([OpFromGraph])
    def inline_ofg_expansion(fgraph, node):
        op = node.op
        if not op.inline:
            return False
        from pytensor_tpu.graph.basic import clone_get_equiv

        memo = {i_inner: i_outer for i_inner, i_outer in
                zip(op.fgraph.inputs, node.inputs)}
        memo = clone_get_equiv(op.fgraph.inputs, op.fgraph.outputs,
                               copy_inputs=False, copy_orphans=False, memo=memo)
        return [memo[o] for o in op.fgraph.outputs]

    optdb.register(
        "inline_ofg_expansion",
        WalkingGraphRewriter(inline_ofg_expansion),
        "fast_run", "fast_compile",
        position=-0.01,
    )


_register_inline_rewrite()


# --- XLA lowering -------------------------------------------------------------

def _register_xla():
    from pytensor_tpu.link.xla.dispatch import xla_funcify

    @xla_funcify.register(OpFromGraph)
    def _ofg(op, node=None, **kw):
        from pytensor_tpu.link.xla.linker import fgraph_to_jax

        inner = fgraph_to_jax(op.fgraph)

        def ofg(*args):
            res = inner(*args)
            return res if len(res) > 1 else res[0]

        return ofg


_register_xla()
