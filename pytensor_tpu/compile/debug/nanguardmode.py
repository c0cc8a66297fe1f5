"""NanGuardMode: check every thunk's inputs/outputs for nan/inf/huge.

Parallels /root/reference/pytensor/compile/debug/nanguardmode.py:140.
On the XLA backend use ``jax.config.update("jax_debug_nans", True)`` for
an equivalent compiled-path check; this mode runs on the oracle VM so
errors point at the exact node.
"""

from __future__ import annotations

import numpy as np

from pytensor_tpu.compile.mode import Mode
from pytensor_tpu.config import config
from pytensor_tpu.link.basic import PerformLinker, raise_with_op


def _check_value(value, what, node, nan_is_error, inf_is_error, big_is_error):
    if not isinstance(value, np.ndarray) or value.dtype.kind not in "fc":
        return
    if nan_is_error and np.isnan(value).any():
        raise AssertionError(f"NanGuardMode: NaN detected in {what} of {node}")
    if inf_is_error and np.isinf(value).any():
        raise AssertionError(f"NanGuardMode: Inf detected in {what} of {node}")
    if big_is_error and np.abs(value[np.isfinite(value)] if np.isinf(value).any()
                               else value).max(initial=0) > 1e10:
        raise AssertionError(f"NanGuardMode: big value detected in {what} of {node}")


class NanGuardLinker(PerformLinker):
    def __init__(self, nan_is_error, inf_is_error, big_is_error):
        super().__init__()
        self.flags = (nan_is_error, inf_is_error, big_is_error)

    def make_thunk(self, **kwargs):
        run, input_storage, output_storage = super().make_thunk(**kwargs)
        storage_map = run.storage_map
        fgraph = self.fgraph
        thunks = run.thunks
        nan_e, inf_e, big_e = self.flags

        def guarded_run():
            for thunk in thunks:
                node = thunk.node
                for i in node.inputs:
                    _check_value(storage_map[i][0], "an input", node,
                                 nan_e, inf_e, big_e)
                try:
                    thunk()
                except Exception:
                    raise_with_op(fgraph, node)
                for o in node.outputs:
                    _check_value(storage_map[o][0], "an output", node,
                                 nan_e, inf_e, big_e)
            return [s[0] for s in run.output_storage]

        guarded_run.storage_map = storage_map
        guarded_run.thunks = thunks
        guarded_run.input_storage = input_storage
        guarded_run.output_storage = run.output_storage
        return guarded_run, input_storage, output_storage


class NanGuardMode(Mode):
    def __init__(self, nan_is_error=None, inf_is_error=None, big_is_error=None,
                 optimizer="fast_run"):
        if nan_is_error is None:
            nan_is_error = config.nan_guard__nan_is_error
        if inf_is_error is None:
            inf_is_error = config.nan_guard__inf_is_error
        if big_is_error is None:
            big_is_error = config.nan_guard__big_is_error
        super().__init__(NanGuardLinker(nan_is_error, inf_is_error, big_is_error),
                         optimizer)

    def make_linker(self, **kwargs):
        return self.linker
