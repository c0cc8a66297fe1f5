"""The Op protocol.

Parallels /root/reference/pytensor/graph/op.py (Op:53, make_node:142,
__call__:184, L_op:410, perform:477, HasInnerGraph:687).  Differences from
the reference are deliberate TPU-first choices:

- there is no ``c_code``; instead each Op gets an XLA lowering registered
  with ``pytensor_tpu.link.xla.dispatch.xla_funcify`` (StableHLO via jax)
  and optionally a Pallas kernel emitter for the hot paths;
- ``perform`` (numpy) is the testing oracle; ops that do not define it
  fall back to eagerly executing their XLA lowering on host.
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

from pytensor_tpu.graph.basic import Apply, Constant, Variable
from pytensor_tpu.utils import MetaObject, add_tag_trace, from_return_values


class Op(MetaObject):
    """An operation: type-level inference (``make_node``), a host
    reference implementation (``perform``), and gradient rules."""

    # optional declarative typing: lists of Types
    itypes: Sequence | None = None
    otypes: Sequence | None = None

    # index of the output returned by __call__ for multi-output ops
    default_output: int | None = None

    # alias metadata (kept for buffer-donation decisions, SURVEY §7):
    # {out_idx: [in_idx, ...]}
    view_map: dict = {}
    destroy_map: dict = {}

    def make_node(self, *inputs: Variable) -> Apply:
        if self.itypes is None or self.otypes is None:
            raise NotImplementedError(
                f"{type(self).__name__} must define make_node or itypes/otypes"
            )
        if len(inputs) != len(self.itypes):
            raise ValueError(
                f"{self} expected {len(self.itypes)} inputs, got {len(inputs)}"
            )
        inputs = [it.filter_variable(i) for it, i in zip(self.itypes, inputs)]
        return Apply(self, inputs, [t() for t in self.otypes])

    def __call__(self, *inputs, name=None, return_list=False, **kwargs):
        node = self.make_node(*inputs, **kwargs)
        self._maybe_compute_test_values(node)
        if self.default_output is not None:
            out = node.outputs[self.default_output]
            if name is not None:
                out.name = name
            return [out] if return_list else out
        if len(node.outputs) == 1:
            out = node.outputs[0]
            if name is not None:
                out.name = name
            return [out] if return_list else out
        return node.outputs

    def _maybe_compute_test_values(self, node: Apply):
        from pytensor_tpu.config import config

        if config.compute_test_value == "off":
            return
        try:
            ivals = []
            for i in node.inputs:
                if isinstance(i, Constant):
                    ivals.append(i.data)
                elif hasattr(i.tag, "test_value"):
                    ivals.append(i.type.filter(i.tag.test_value))
                else:
                    raise AttributeError(f"no test value for {i}")
            storage = [[None] for _ in node.outputs]
            self.perform(node, ivals, storage)
            for o, s in zip(node.outputs, storage):
                o.tag.test_value = s[0]
        except NotImplementedError:
            pass
        except AttributeError:
            if config.compute_test_value == "raise":
                raise

    # --- runtime ---
    def perform(self, node: Apply, inputs: Sequence[Any], output_storage: Sequence[list]):
        """numpy reference implementation; fills output_storage[i][0].

        Default: execute the registered XLA lowering eagerly on host.
        """
        from pytensor_tpu.link.xla.dispatch import eager_perform

        eager_perform(self, node, inputs, output_storage)

    def make_thunk(self, node, storage_map, compute_map=None, no_recycling=(), impl=None):
        """Build a no-argument callable evaluating ``node`` via perform."""
        in_storage = [storage_map[i] for i in node.inputs]
        out_storage = [storage_map[o] for o in node.outputs]
        perform = self.perform

        def thunk():
            perform(node, [s[0] for s in in_storage], out_storage)
            if compute_map is not None:
                for o in node.outputs:
                    compute_map[o][0] = True

        thunk.inputs = in_storage
        thunk.outputs = out_storage
        thunk.perform = True
        return thunk

    # --- gradients ---
    def grad(self, inputs: Sequence[Variable], output_grads: Sequence[Variable]):
        raise NotImplementedError(f"{type(self).__name__} has no gradient defined")

    def L_op(self, inputs, outputs, output_grads):
        """vJp rule. Default delegates to ``grad`` (which may not need outputs)."""
        return self.grad(inputs, output_grads)

    def R_op(self, inputs, eval_points):
        raise NotImplementedError(f"{type(self).__name__}.R_op")

    # --- static analysis ---
    def infer_shape(self, fgraph, node, input_shapes):
        """Return symbolic output shapes (list of tuples of scalar Variables)."""
        raise NotImplementedError()

    def do_constant_folding(self, fgraph, node) -> bool:
        return True

    def connection_pattern(self, node):
        """[[bool for each output] for each input]: which inputs affect which outputs."""
        return [[True for _ in node.outputs] for _ in node.inputs]


class HasInnerGraph:
    """Mixin for ops holding an inner FunctionGraph (Scan, OpFromGraph)."""

    @property
    def fn(self):
        raise NotImplementedError

    @property
    def inner_inputs(self):
        return self.fgraph.inputs

    @property
    def inner_outputs(self):
        return self.fgraph.outputs

    def clone(self):
        raise NotImplementedError


def compute_test_value(node: Apply):
    node.op._maybe_compute_test_values(node)


def get_test_value(v):
    """Return a test value for ``v`` or raise TestValueError."""
    if isinstance(v, Constant):
        return v.data
    if hasattr(v, "tag") and hasattr(v.tag, "test_value"):
        return v.tag.test_value
    raise TestValueError(f"{v} has no test value")


class TestValueError(AttributeError):
    pass


missing_test_message = get_test_value
