"""In/Out wrappers for function() (reference compile/io.py)."""

from __future__ import annotations

from pytensor_tpu.graph.basic import Variable


class SymbolicInput:
    def __init__(self, variable, name=None, update=None, mutable=None,
                 strict=False, allow_downcast=None, implicit=False, value=None,
                 borrow=None, shared=False):
        self.variable = variable
        self.name = name if name is not None else variable.name
        self.update = update
        self.mutable = mutable if mutable is not None else (update is not None)
        self.strict = strict
        self.allow_downcast = allow_downcast
        self.implicit = implicit
        self.value = value
        self.shared = shared

    def __str__(self):
        if self.update is not None:
            return f"In({self.variable} -> {self.update})"
        return f"In({self.variable})"


class In(SymbolicInput):
    pass


class SymbolicOutput:
    def __init__(self, variable, borrow=False):
        self.variable = variable
        self.borrow = borrow

    def __str__(self):
        return f"Out({self.variable})"


class Out(SymbolicOutput):
    pass
