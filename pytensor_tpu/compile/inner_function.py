"""HasInnerFunction: inner-graph ops whose oracle perform runs a
compiled inner function (reference compile/inner_function.py:26).

On the XLA backend inner graphs are funcified directly and perform
never runs; the mixin exists for the oracle (PerformLinker) path and
for API parity.
"""

from __future__ import annotations

from pytensor_tpu.graph.op import HasInnerGraph


class HasInnerFunction(HasInnerGraph):
    """Mixin: lazily compile self.fgraph with the oracle linker and run
    it from ``perform``."""

    _inner_fn = None

    @property
    def fn(self):
        if self._inner_fn is None:
            from pytensor_tpu.compile.maker import function
            from pytensor_tpu.compile.mode import Mode

            self._inner_fn = function(
                list(self.fgraph.inputs), list(self.fgraph.outputs),
                mode=Mode(linker="py", optimizer="None"))
        return self._inner_fn

    def perform(self, node, inputs, output_storage):
        outs = self.fn(*inputs)
        if not isinstance(outs, (list, tuple)):
            outs = [outs]
        for s, v in zip(output_storage, outs):
            s[0] = v
