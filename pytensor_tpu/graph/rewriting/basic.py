"""The rewrite engine.

Parallels /root/reference/pytensor/graph/rewriting/basic.py
(GraphRewriter:89, NodeRewriter:157, node_rewriter:1035,
PatternNodeRewriter:1425, WalkingGraphRewriter:2028,
EquilibriumGraphRewriter:2219, MergeOptimizer + MergeFeature:530,
copy_stack_trace:2865) with an original implementation.
"""

from __future__ import annotations

import functools
import sys
import time
import traceback
from collections import defaultdict, deque
from typing import Callable, Iterable, Sequence

from pytensor_tpu.config import config
from pytensor_tpu.graph.basic import Apply, AtomicVariable, Constant, Variable
from pytensor_tpu.graph.features import Feature
from pytensor_tpu.graph.fg import FunctionGraph
from pytensor_tpu.utils import uniq


class MetaRewriter:
    name: str | None = None

    def add_requirements(self, fgraph: FunctionGraph):
        """Attach any Features this rewriter needs."""

    def print_summary(self, stream=sys.stdout, level=0, depth=-1):
        print(f"{' ' * level}{type(self).__name__} ({self.name or ''})", file=stream)

    def __str__(self):
        return self.name or type(self).__name__


class GraphRewriter(MetaRewriter):
    """Rewriter applied to a whole FunctionGraph."""

    def apply(self, fgraph: FunctionGraph):
        raise NotImplementedError

    def rewrite(self, fgraph: FunctionGraph, *args, **kwargs):
        self.add_requirements(fgraph)
        return self.apply(fgraph, *args, **kwargs)

    def __call__(self, fgraph):
        return self.rewrite(fgraph)


class NodeRewriter(MetaRewriter):
    """Rewriter operating on a single Apply node.

    ``transform`` returns False/None (no match), a list of replacement
    output variables, or a dict {old_var: new_var}.
    """

    def tracks(self) -> Sequence | None:
        """Op (classes or instances) this rewriter may fire on, or None for all."""
        return None

    def transform(self, fgraph: FunctionGraph, node: Apply):
        raise NotImplementedError

    def __call__(self, fgraph, node):
        return self.transform(fgraph, node)


class FromFunctionGraphRewriter(GraphRewriter):
    def __init__(self, fn, requirements=()):
        self.fn = fn
        self.requirements = requirements
        self.name = getattr(fn, "__name__", None)

    def apply(self, fgraph, *args, **kwargs):
        return self.fn(fgraph, *args, **kwargs)

    def add_requirements(self, fgraph):
        for req in self.requirements:
            req(fgraph)


def graph_rewriter(fn) -> FromFunctionGraphRewriter:
    """Decorator turning ``fn(fgraph)`` into a GraphRewriter."""
    return FromFunctionGraphRewriter(fn)


class FromFunctionNodeRewriter(NodeRewriter):
    def __init__(self, fn, tracks=None, inplace=False):
        self.fn = fn
        self._tracks = tracks
        self.inplace = inplace
        self.name = getattr(fn, "__name__", None)
        self.__doc__ = getattr(fn, "__doc__", None)

    def tracks(self):
        return self._tracks

    def transform(self, fgraph, node):
        if self._tracks is not None:
            op = node.op
            if not any(
                (isinstance(t, type) and isinstance(op, t)) or op == t
                for t in self._tracks
            ):
                return False
        return self.fn(fgraph, node)

    def __str__(self):
        return self.name or "FromFunctionNodeRewriter"


def node_rewriter(tracks: Sequence | None, inplace: bool = False):
    """Decorator: ``@node_rewriter([SomeOp])`` over ``fn(fgraph, node)``."""

    def decorator(fn):
        rewriter = FromFunctionNodeRewriter(fn, tracks, inplace)
        functools.update_wrapper(rewriter, fn, updated=[])
        return rewriter

    return decorator


def copy_stack_trace(from_var, to_var):
    """Propagate creation traces through rewrites (provenance)."""
    tr = []
    if isinstance(from_var, Iterable) and not isinstance(from_var, Variable):
        for v in from_var:
            tr += getattr(v.tag, "trace", [])
    else:
        tr = getattr(from_var.tag, "trace", [])
    if isinstance(to_var, Iterable) and not isinstance(to_var, Variable):
        for v in to_var:
            v.tag.trace = list(tr)
    else:
        to_var.tag.trace = list(tr)
    return to_var


class SequentialGraphRewriter(GraphRewriter):
    """Apply sub-rewriters in order."""

    def __init__(self, *rewriters, name=None, failure_callback=None):
        if len(rewriters) == 1 and isinstance(rewriters[0], (list, tuple)):
            rewriters = rewriters[0]
        self.rewriters = list(rewriters)
        self.name = name
        self.failure_callback = failure_callback

    def apply(self, fgraph):
        profs = []
        for rewriter in self.rewriters:
            try:
                t0 = time.perf_counter()
                profs.append((str(rewriter), rewriter.rewrite(fgraph), time.perf_counter() - t0))
            except Exception as e:
                if config.on_opt_error == "raise":
                    raise
                if config.on_opt_error == "warn":
                    import warnings

                    warnings.warn(f"Rewrite failure ({rewriter}): {e}")
        return profs

    def add_requirements(self, fgraph):
        for r in self.rewriters:
            r.add_requirements(fgraph)

    def print_summary(self, stream=sys.stdout, level=0, depth=-1):
        super().print_summary(stream, level, depth)
        if depth != 0:
            for r in self.rewriters:
                r.print_summary(stream, level + 2, depth - 1)


def _apply_node_rewriter(fgraph, rewriter, node):
    """Run one node rewriter on one node and apply its replacements.
    Returns True if the graph changed."""
    repl = rewriter.transform(fgraph, node)
    if not repl:
        return False
    if isinstance(repl, dict):
        pairs = [(k, v) for k, v in repl.items() if k != "remove"]
    else:
        if len(repl) != len(node.outputs):
            raise ValueError(
                f"Node rewriter {rewriter} replaced {len(node.outputs)} outputs "
                f"with {len(repl)} values on {node}"
            )
        pairs = [
            (o, n) for o, n in zip(node.outputs, repl) if n is not None and o is not n
        ]
    if not pairs:
        return False
    fgraph.replace_all_validate(pairs, reason=str(rewriter))
    return True


class WalkingGraphRewriter(GraphRewriter):
    """One pass over the graph in topological order, applying a node rewriter."""

    def __init__(self, node_rewriter, order: str = "in_to_out", ignore_newtrees=False,
                 failure_callback=None, name=None):
        self.node_rewriter = node_rewriter
        self.order = order
        self.ignore_newtrees = ignore_newtrees
        self.name = name or f"Walking({node_rewriter})"

    def add_requirements(self, fgraph):
        self.node_rewriter.add_requirements(fgraph)

    def apply(self, fgraph):
        nodes = fgraph.toposort()
        if self.order == "out_to_in":
            nodes = list(reversed(nodes))
        nb = 0
        for node in nodes:
            if node not in fgraph.apply_nodes:
                continue
            try:
                if _apply_node_rewriter(fgraph, self.node_rewriter, node):
                    nb += 1
            except Exception as e:
                if config.on_opt_error == "raise":
                    raise
                if config.on_opt_error == "warn":
                    import warnings

                    warnings.warn(f"Rewrite failure in {self.node_rewriter} on {node}: {e}")
        return nb


def in2out(*node_rewriters, name=None, ignore_newtrees=False, **kwargs):
    """Walking rewriter(s) applied input-to-output (reference in2out)."""
    if len(node_rewriters) > 1:
        from pytensor_tpu.graph.rewriting.basic import SequentialNodeRewriter

        nr = SequentialNodeRewriter(*node_rewriters)
    else:
        nr = node_rewriters[0]
    return WalkingGraphRewriter(nr, order="in_to_out", ignore_newtrees=ignore_newtrees,
                                name=name)


class SequentialNodeRewriter(NodeRewriter):
    """Try several node rewriters on a node; first match wins per pass."""

    def __init__(self, *rewriters, apply_all_rewrites=False, name=None):
        self.rewriters = list(rewriters)
        self.apply_all = apply_all_rewrites
        self.name = name

    def tracks(self):
        t = []
        for r in self.rewriters:
            rt = r.tracks()
            if rt is None:
                return None
            t.extend(rt)
        return t

    def transform(self, fgraph, node):
        for r in self.rewriters:
            res = r.transform(fgraph, node)
            if res:
                return res
        return False

    def add_requirements(self, fgraph):
        for r in self.rewriters:
            r.add_requirements(fgraph)


class OpToRewriterTracker:
    """Index node rewriters by the Ops they track (reference :1089)."""

    def __init__(self):
        self.tracked_instances: dict = defaultdict(list)
        self.tracked_types: dict = defaultdict(list)
        self.untracked: list = []

    def add_tracker(self, rewriter: NodeRewriter):
        tracks = rewriter.tracks()
        if tracks is None:
            self.untracked.append(rewriter)
        else:
            for t in tracks:
                if isinstance(t, type):
                    self.tracked_types[t].append(rewriter)
                else:
                    self.tracked_instances[t].append(rewriter)

    def get_trackers(self, op) -> list:
        res = list(self.tracked_instances.get(op, ()))
        for typ, rs in self.tracked_types.items():
            if isinstance(op, typ):
                res.extend(rs)
        res.extend(self.untracked)
        return res


class EquilibriumGraphRewriter(GraphRewriter):
    """Apply node rewriters repeatedly until fixpoint (or max passes)."""

    def __init__(self, rewriters, max_use_ratio: float = 8.0, ignore_newtrees=False,
                 failure_callback=None, name=None):
        self.rewriters = list(rewriters)
        self.max_use_ratio = max_use_ratio
        self.name = name
        self.tracker = OpToRewriterTracker()
        self.global_rewriters = []
        for r in self.rewriters:
            if isinstance(r, GraphRewriter):
                self.global_rewriters.append(r)
            else:
                self.tracker.add_tracker(r)

    def add_requirements(self, fgraph):
        for r in self.rewriters:
            r.add_requirements(fgraph)

    def apply(self, fgraph):
        max_uses = self.max_use_ratio * (len(fgraph.apply_nodes) + len(self.rewriters) + 10)
        uses = 0
        changed = True
        passes = 0
        while changed and uses < max_uses:
            changed = False
            passes += 1
            for grew in self.global_rewriters:
                try:
                    grew.apply(fgraph)
                except Exception as e:
                    if config.on_opt_error == "raise":
                        raise
            q = deque(fgraph.toposort())
            while q:
                node = q.popleft()
                if node not in fgraph.apply_nodes:
                    continue
                for r in self.tracker.get_trackers(node.op):
                    if node not in fgraph.apply_nodes:
                        break
                    try:
                        if _apply_node_rewriter(fgraph, r, node):
                            uses += 1
                            changed = True
                            break
                    except Exception as e:
                        if config.on_opt_error == "raise":
                            raise
                        if config.on_opt_error == "warn":
                            import warnings

                            warnings.warn(f"Rewrite failure in {r} on {node}: {e}")
            if uses >= max_uses:
                import warnings

                warnings.warn(
                    f"EquilibriumGraphRewriter {self.name}: max use ratio reached"
                )
        return passes


class MergeFeature(Feature):
    """Tracks constant signatures & node hashes for CSE."""

    def on_attach(self, fgraph):
        if hasattr(fgraph, "merge_feature"):
            from pytensor_tpu.graph.features import AlreadyThere

            raise AlreadyThere()
        fgraph.merge_feature = self


class MergeOptimizer(GraphRewriter):
    """Common-subexpression elimination: merge Apply nodes with the same op
    and same inputs, and duplicate constants (reference MergeOptimizer)."""

    name = "MergeOptimizer"

    def apply(self, fgraph):
        nb_merged = 0
        # 1. merge equal constants
        sig_to_const: dict = {}
        for var in list(fgraph.variables):
            if isinstance(var, Constant):
                try:
                    sig = var.signature()
                except Exception:
                    continue
                first = sig_to_const.get(sig)
                if first is None:
                    sig_to_const[sig] = var
                elif first is not var and first.type == var.type:
                    for client in list(fgraph.clients.get(var, [])):
                        node, idx = client
                        fgraph.change_node_input(node, idx, first, reason="MergeOptimizer",
                                                 check=False)
                    nb_merged += 1
        # 2. merge identical applies, iterating to fixpoint
        changed = True
        while changed:
            changed = False
            seen: dict = {}
            for node in fgraph.toposort():
                if node not in fgraph.apply_nodes:
                    continue
                if node.op.destroy_map:
                    continue  # never merge destructive ops
                try:
                    key = (node.op, tuple(node.inputs))
                except TypeError:
                    continue
                prev = seen.get(key)
                if prev is None:
                    seen[key] = node
                elif prev is not node:
                    pairs = list(zip(node.outputs, prev.outputs))
                    try:
                        fgraph.replace_all_validate(pairs, reason="MergeOptimizer")
                        nb_merged += 1
                        changed = True
                    except Exception:
                        pass
        return nb_merged


merge_optimizer = MergeOptimizer()


class PatternNodeRewriter(NodeRewriter):
    """Declarative in->out pattern rewriting.

    Patterns are nested tuples ``(op, arg_pattern...)`` with string
    placeholders for variables, e.g.::

        PatternNodeRewriter((neg, (neg, "x")), "x")

    Constraints may be attached via ``{"pattern": p, "constraint": fn}``.
    Simplified from reference graph/rewriting/basic.py:1425 (no
    commutative backtracking; register both orders when needed).
    """

    def __init__(self, in_pattern, out_pattern, allow_multiple_clients=True,
                 name=None, values_eq_approx=None, tracks=(), get_nodes=None):
        self.in_pattern = in_pattern
        self.out_pattern = out_pattern
        self.allow_multiple_clients = allow_multiple_clients
        self.name = name or f"{in_pattern} -> {out_pattern}"
        if isinstance(in_pattern, (list, tuple)):
            self.op = in_pattern[0]
        else:
            raise TypeError("in_pattern must be a tuple (op, args...)")

    def tracks(self):
        return [self.op]

    def transform(self, fgraph, node):
        if node.op != self.op and not (
            isinstance(self.op, type) and isinstance(node.op, self.op)
        ):
            return False
        bindings: dict = {}
        if not self._match(node.out if len(node.outputs) == 1 else node.outputs[0],
                           self.in_pattern, bindings, fgraph):
            return False
        out = self._build(self.out_pattern, bindings, node)
        if out is None:
            return False
        out = node.outputs[0].type.filter_variable(out)
        copy_stack_trace(node.outputs[0], out)
        return [out]

    def _match(self, var, pattern, bindings, fgraph):
        if isinstance(pattern, str):
            if pattern in bindings:
                return bindings[pattern] is var
            bindings[pattern] = var
            return True
        if isinstance(pattern, (list, tuple)):
            op, *args = pattern
            if var.owner is None:
                return False
            node_op = var.owner.op
            if isinstance(op, type):
                if not isinstance(node_op, op):
                    return False
            elif node_op != op:
                return False
            if len(var.owner.inputs) != len(args):
                return False
            if not self.allow_multiple_clients and len(fgraph.clients.get(var, [])) > 1:
                return False
            return all(
                self._match(i, p, bindings, fgraph)
                for i, p in zip(var.owner.inputs, args)
            )
        if isinstance(pattern, dict):
            p = pattern["pattern"]
            constraint = pattern.get("constraint")
            if not self._match(var, p, bindings, fgraph):
                return False
            return constraint is None or constraint(var)
        if isinstance(pattern, Variable):
            return isinstance(var, Constant) and pattern.equals(var)
        # raw value -> match against constants
        if isinstance(var, Constant):
            import numpy as np

            return bool(np.all(np.asarray(var.data) == pattern))
        return False

    def _build(self, pattern, bindings, node):
        if isinstance(pattern, str):
            return bindings[pattern]
        if isinstance(pattern, (list, tuple)):
            op, *args = pattern
            built = [self._build(a, bindings, node) for a in args]
            if any(b is None for b in built):
                return None
            return op(*built)
        if isinstance(pattern, Variable):
            return pattern
        # raw constant value
        from pytensor_tpu.tensor.basic import as_tensor_variable

        return as_tensor_variable(pattern)


class SubstitutionNodeRewriter(NodeRewriter):
    """Replace op1 applications with op2 over the same inputs."""

    def __init__(self, op1, op2, transfer_tags=True):
        self.op1 = op1
        self.op2 = op2
        self.transfer_tags = transfer_tags
        self.name = f"{op1} -> {op2}"

    def tracks(self):
        return [self.op1]

    def transform(self, fgraph, node):
        if node.op != self.op1:
            return False
        repl = self.op2.make_node(*node.inputs)
        if self.transfer_tags:
            for old, new in zip(node.outputs, repl.outputs):
                copy_stack_trace(old, new)
                new.name = old.name
        return repl.outputs


class RemovalNodeRewriter(NodeRewriter):
    """Remove op applications that are identity on their first input."""

    def __init__(self, op):
        self.op = op
        self.name = f"remove_{op}"

    def tracks(self):
        return [self.op]

    def transform(self, fgraph, node):
        if node.op != self.op:
            return False
        return [node.inputs[0]]


def pre_greedy_node_rewriter(fgraph, rewrites, out):
    """Apply node rewrites greedily bottom-up on the graph ending at ``out``
    before it is in a FunctionGraph (used by constant folding in patterns)."""
    from pytensor_tpu.graph.basic import Apply

    def process(var, seen):
        if var.owner is None or var in seen:
            return var
        seen.add(var)
        node = var.owner
        for i, inp in enumerate(node.inputs):
            process(inp, seen)
        for rw in rewrites:
            res = rw.transform(fgraph, node)
            if res:
                return res[var.index or 0]
        return var

    return process(out, set())
