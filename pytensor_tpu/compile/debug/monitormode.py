"""MonitorMode: user callbacks around every thunk.

Parallels /root/reference/pytensor/compile/debug/monitormode.py:9.
"""

from __future__ import annotations

import numpy as np

from pytensor_tpu.compile.mode import Mode
from pytensor_tpu.link.basic import PerformLinker, raise_with_op


class MonitorLinker(PerformLinker):
    def __init__(self, pre_func=None, post_func=None):
        super().__init__()
        self.pre_func = pre_func
        self.post_func = post_func

    def make_thunk(self, **kwargs):
        run, input_storage, output_storage = super().make_thunk(**kwargs)
        fgraph = self.fgraph
        thunks = run.thunks
        pre, post = self.pre_func, self.post_func

        def monitored_run():
            for thunk in thunks:
                node = thunk.node
                if pre is not None:
                    pre(node, thunk)
                try:
                    thunk()
                except Exception:
                    raise_with_op(fgraph, node)
                if post is not None:
                    post(node, thunk)
            return [s[0] for s in run.output_storage]

        monitored_run.storage_map = run.storage_map
        monitored_run.thunks = thunks
        monitored_run.input_storage = input_storage
        monitored_run.output_storage = run.output_storage
        return monitored_run, input_storage, output_storage


class MonitorMode(Mode):
    def __init__(self, pre_func=None, post_func=None, optimizer="fast_run"):
        super().__init__(MonitorLinker(pre_func, post_func), optimizer)

    def make_linker(self, **kwargs):
        return self.linker


def detect_nan(node, thunk):
    """Example post-callback (reference detect_nan:102)."""
    for output in thunk.outputs:
        v = output[0]
        if isinstance(v, np.ndarray) and v.dtype.kind == "f" and np.isnan(v).any():
            from pytensor_tpu.printing import debugprint

            print("*** NaN detected ***")
            debugprint(node)
            raise AssertionError(f"NaN in output of {node}")
