"""Scan helpers (reference scan/utils.py: until:95)."""

from __future__ import annotations

from pytensor_tpu.tensor.basic import as_tensor_variable


class until:
    """While-loop marker: return ``until(cond)`` from a scan step fn."""

    def __init__(self, condition):
        self.condition = as_tensor_variable(condition)
        if self.condition.type.ndim != 0:
            raise TypeError("until condition must be a scalar")


class ScanProfileStats:
    """Per-Scan profiling record (reference scan/utils.py:114).

    On the XLA backend the inner graph is fused into the same executable
    as the outer graph, so per-step timing can't be observed from the
    host; this records what is observable — number of compiled scans,
    steps per call when static, and aggregate call time attributed by
    the PerformLinker oracle.
    """

    def __init__(self, name=None):
        self.name = name
        self.callcount = 0
        self.nbsteps = 0
        self.call_time = 0.0

    def record(self, n_steps, dt):
        self.callcount += 1
        self.nbsteps += int(n_steps)
        self.call_time += dt

    def summary(self, file=None):
        import sys

        print(
            f"ScanProfileStats({self.name}): {self.callcount} calls, "
            f"{self.nbsteps} total steps, {self.call_time:.6f}s",
            file=file or sys.stdout,
        )
