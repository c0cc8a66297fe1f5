"""DebugMode: per-node dual execution, oracle vs XLA, with rewrite blame.

The TPU generalization of the reference DebugMode
(compile/debug/debugmode.py:2166): instead of comparing Python vs C
implementations per node, every node is evaluated BOTH with its numpy
``perform`` (the oracle) and with its XLA lowering run eagerly; outputs
must match under ``values_eq_approx`` or BadThunkOutput is raised with
the offending node.  This catches wrong lowerings the same way the
reference catches bad C code.

Rewrite blame (reference debugmode.py:694 ``_find_bad_optimizations``):
DebugMode records the full rewrite history (FullHistory with per-change
reasons).  After a run, the final outputs are re-derived from the
UNREWRITTEN graph; on mismatch the history is replayed change by change,
evaluating after each, and the first change that flips the outputs from
correct to wrong is reported in a ``BadOptimization`` naming the
offending rewrite.
"""

from __future__ import annotations

import numpy as np

from pytensor_tpu.compile.mode import Mode
from pytensor_tpu.graph.basic import Constant
from pytensor_tpu.graph.rewriting.basic import GraphRewriter
from pytensor_tpu.link.basic import Linker, PerformLinker, raise_with_op
from pytensor_tpu.tensor.type import TensorType


class BadThunkOutput(Exception):
    """Oracle and XLA lowering disagree on a node's output."""


class BadOptimization(Exception):
    """A graph rewrite changed the computed result."""


def _eval_fgraph(fgraph, in_vals):
    """Evaluate a FunctionGraph with the oracle ``perform`` path."""
    from pytensor_tpu.graph.traversal import io_toposort

    storage = {}
    for var, val in zip(fgraph.inputs, in_vals):
        storage[var] = val
    for node in io_toposort(fgraph.inputs, fgraph.outputs):
        ins = []
        for i in node.inputs:
            if i in storage:
                ins.append(storage[i])
            elif isinstance(i, Constant):
                ins.append(i.data)
            else:
                raise ValueError(f"uncomputed input {i}")
        out_storage = [[None] for _ in node.outputs]
        node.op.perform(node, ins, out_storage)
        for o, s in zip(node.outputs, out_storage):
            storage[o] = s[0]
    outs = []
    for o in fgraph.outputs:
        outs.append(o.data if isinstance(o, Constant) else storage[o])
    return outs


def _outputs_match(fgraph, a_vals, b_vals, rtol, atol):
    for o, a, b in zip(fgraph.outputs, a_vals, b_vals):
        if not isinstance(o.type, TensorType):
            continue
        if a is None or b is None:
            return a is b
        if not o.type.values_eq_approx(
                np.asarray(a, dtype=o.type.numpy_dtype),
                np.asarray(b, dtype=o.type.numpy_dtype),
                rtol=rtol, atol=atol):
            return False
    return True


def _canon_signature(fgraph) -> str:
    """Structural graph signature, independent of object identity —
    recurses into HasInnerGraph ops (whose __eq__ is identity, so
    equal_computations cannot compare across independent rewrites)."""
    from pytensor_tpu.graph.op import HasInnerGraph

    in_pos = {v: i for i, v in enumerate(fgraph.inputs)}
    memo = {}

    def sig(v):
        if v in memo:
            return memo[v]
        if v in in_pos:
            s = f"in{in_pos[v]}"
        elif isinstance(v, Constant):
            data = v.data
            try:
                body = np.asarray(data).tobytes().hex()[:32]
            except Exception:
                body = repr(data)
            s = f"const[{v.type}]{body}"
        elif v.owner is None:
            s = f"free[{v.type}]"
        else:
            node = v.owner
            op = node.op
            if isinstance(op, HasInnerGraph):
                op_s = (f"{type(op).__name__}"
                        f"<{_canon_signature(op.fgraph)}>")
            else:
                op_s = str(op)
            args = ",".join(sig(i) for i in node.inputs)
            s = f"{op_s}({args})#{node.outputs.index(v)}"
        memo[v] = s
        return s

    return ";".join(sig(o) for o in fgraph.outputs)


class StochasticOrder(Exception):
    """Rewriting the same graph twice gave different results — some
    rewrite iterates in a memory-address-dependent order (reference
    debugmode.py:287)."""


class _RecordingRewriter(GraphRewriter):
    """Run the mode's pipeline with a reason-recording FullHistory
    attached; leave the history on the fgraph for the blame pass.
    Also rewrites a CLONE of the pristine graph and compares: a
    structural mismatch means the pipeline is nondeterministic."""

    def __init__(self, inner, check_stochastic_order=True):
        self.inner = inner
        self.check_stochastic_order = check_stochastic_order

    def apply(self, fgraph):
        from pytensor_tpu.graph.features import AlreadyThere, FullHistory

        twin = None
        if self.check_stochastic_order:
            try:
                twin = fgraph.clone(check_integrity=False)
            except Exception:
                twin = None
        hist = FullHistory()
        try:
            fgraph.attach_feature(hist)
        except AlreadyThere:
            hist = None
        res = self.inner.apply(fgraph)
        if hist is not None:
            fgraph._debug_full_history = hist
        if twin is not None:
            try:
                self.inner.apply(twin)
            except Exception:
                twin = None  # twin-specific failure: skip the check
            if twin is not None:
                if _canon_signature(fgraph) != _canon_signature(twin):
                    raise StochasticOrder(
                        "rewriting the same graph twice produced different "
                        "results; a rewrite likely iterates in id()-order")
        return res

    def add_requirements(self, fgraph):
        add = getattr(self.inner, "add_requirements", None)
        if add is not None:
            add(fgraph)


class DebugLinker(PerformLinker):
    def __init__(self, check_isfinite=False, rtol=None, atol=None):
        super().__init__()
        self.check_isfinite = check_isfinite
        self.rtol = rtol
        self.atol = atol

    def make_thunk(self, **kwargs):
        run, input_storage, output_storage = super().make_thunk(**kwargs)
        storage_map = run.storage_map
        fgraph = self.fgraph
        thunks = run.thunks
        check_isfinite = self.check_isfinite
        rtol, atol = self.rtol, self.atol

        from pytensor_tpu.link.xla.dispatch import ensure_registered, xla_funcify

        ensure_registered()

        def find_bad_rewrite(in_vals, opt_outs):
            """Replay the rewrite history; return the reason of the first
            change that makes the outputs diverge (reference
            debugmode.py:694)."""
            hist = getattr(fgraph, "_debug_full_history", None)
            if hist is None or not hist.fw:
                return None, False
            try:
                hist.start()
                ref_outs = _eval_fgraph(fgraph, in_vals)
                if _outputs_match(fgraph, ref_outs, opt_outs, rtol, atol):
                    return None, False  # rewrites preserved the result
                # linear forward replay: first change whose graph stops
                # matching the unrewritten result is the culprit
                while hist.pointer < len(hist.fw) - 1:
                    hist.next()
                    try:
                        step_outs = _eval_fgraph(fgraph, in_vals)
                    except Exception:
                        continue  # mid-rewrite graphs can be transient
                    if not _outputs_match(fgraph, ref_outs, step_outs,
                                          rtol, atol):
                        return hist.reasons[hist.pointer], True
                return "<unidentified rewrite>", True
            finally:
                hist.end()

        def dual_run():
            for thunk in thunks:
                node = thunk.node
                try:
                    thunk()
                except Exception:
                    raise_with_op(fgraph, node)
                # oracle outputs now in storage; re-run via XLA eagerly
                in_vals = [storage_map[i][0] for i in node.inputs]
                try:
                    fn = xla_funcify(node.op, node=node)
                    res = fn(*in_vals)
                except NotImplementedError:
                    continue
                except Exception:
                    continue  # lowering needs trace-time context; skip
                if not isinstance(res, (list, tuple)):
                    res = (res,)
                for o, r in zip(node.outputs, res):
                    oracle_val = storage_map[o][0]
                    if not isinstance(o.type, TensorType):
                        continue
                    xla_val = np.asarray(r)
                    ok = o.type.values_eq_approx(
                        np.asarray(oracle_val, dtype=o.type.numpy_dtype),
                        np.asarray(xla_val, dtype=o.type.numpy_dtype),
                        rtol=rtol, atol=atol,
                    )
                    if not ok:
                        raise BadThunkOutput(
                            f"DebugMode: oracle and XLA lowering disagree on "
                            f"{node} output {o}:\n oracle={oracle_val}\n "
                            f"xla={xla_val}"
                        )
                    if check_isfinite and np.asarray(oracle_val).dtype.kind == "f" \
                            and not np.all(np.isfinite(oracle_val)):
                        raise BadThunkOutput(f"DebugMode: non-finite output of {node}")
            # graph-level check: did the rewrite pipeline change the result?
            opt_outs = [s[0] for s in run.output_storage]
            in_vals = [storage_map[i][0] for i in fgraph.inputs]
            try:
                reason, bad = find_bad_rewrite(in_vals, opt_outs)
            except Exception:
                reason, bad = None, False  # blame is best-effort
            if bad:
                raise BadOptimization(
                    f"DebugMode: a rewrite changed the computed outputs; "
                    f"first diverging change was introduced by: {reason}"
                )
            return [s[0] for s in run.output_storage]

        dual_run.storage_map = storage_map
        dual_run.thunks = thunks
        dual_run.input_storage = input_storage
        dual_run.output_storage = run.output_storage
        return dual_run, input_storage, output_storage


class DebugMode(Mode):
    def __init__(self, optimizer="fast_run", check_isfinite=False, **kwargs):
        super().__init__(DebugLinker(check_isfinite=check_isfinite), optimizer)

    @property
    def optimizer(self):
        return _RecordingRewriter(Mode.optimizer.fget(self))

    def including(self, *tags):
        m = DebugMode()
        m.linker = self.linker
        m._optimizer = self._optimizer.including(*tags)
        m.provided_optimizer = m._optimizer
        return m

    def excluding(self, *tags):
        m = DebugMode()
        m.linker = self.linker
        m._optimizer = self._optimizer.excluding(*tags)
        m.provided_optimizer = m._optimizer
        return m

    def make_linker(self, **kwargs):
        return self.linker
