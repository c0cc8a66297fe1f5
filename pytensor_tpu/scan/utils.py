"""Scan helpers (reference scan/utils.py: until:95)."""

from __future__ import annotations

from pytensor_tpu.tensor.basic import as_tensor_variable


class until:
    """While-loop marker: return ``until(cond)`` from a scan step fn."""

    def __init__(self, condition):
        self.condition = as_tensor_variable(condition)
        if self.condition.type.ndim != 0:
            raise TypeError("until condition must be a scalar")
