"""Dynamic-length while-scan outputs: executed-prefix semantics.

The reference's ``until`` scans return only the steps actually executed
(/root/reference/pytensor/scan/op.py:1827 — the perform loop exits early
and the output buffers are cut; behavior pinned by
/root/reference/tests/scan/test_basic.py TestGradUntil).  XLA cannot
express dynamic shapes inside one executable, so this build splits the
semantics:

- The Scan op's raw while outputs are STATIC ``(n_steps, *core)`` buffers
  zero-padded past the exit step, plus a trailing ``steps_done`` scalar.
- ``scan()`` wraps each user-visible trace in :class:`TruncateToDone`,
  whose *graph semantics* (type shape ``(None, *core)``, oracle
  ``perform``, gradient) are the executed prefix ``trace[:steps_done]``.
- On the numpy oracle everything downstream just works (dynamic shapes
  are free at runtime).
- On the XLA path the :class:`WhileScanDynLen` pass (tag ``"xla"``, so it
  runs exactly when the XLA linker is selected) eliminates every
  ``TruncateToDone`` before lowering: row-wise ops propagate the
  truncation marker, collapse points (reductions, indexing, the function
  boundary) are rewritten into masked/static equivalents, and anything
  it cannot express raises with guidance.

Shape graphs need no special casing: ``TruncateToDone.infer_shape``
reports ``(steps_done, *core)`` so ShapeOpt folds ``shape(out)[0]`` to
the executed count on both backends.
"""

from __future__ import annotations

import numpy as np

from pytensor_tpu.graph.basic import Apply, Constant
from pytensor_tpu.graph.null_type import DisconnectedType
from pytensor_tpu.graph.op import Op
from pytensor_tpu.graph.rewriting.basic import GraphRewriter
from pytensor_tpu.tensor.type import TensorType


class TruncateToDone(Op):
    """``out = trace[:steps_done]`` — the executed prefix of a while-scan
    trace.  ``steps_done`` is the scan's trailing int64 output."""

    __props__ = ()
    view_map = {0: [0]}

    def make_node(self, trace, steps_done):
        from pytensor_tpu.tensor.basic import as_tensor_variable

        trace = as_tensor_variable(trace)
        steps_done = as_tensor_variable(steps_done)
        if steps_done.type.ndim != 0:
            raise TypeError("steps_done must be a scalar")
        out = TensorType(trace.type.dtype, (None, *trace.type.shape[1:]))()
        return Apply(self, [trace, steps_done], [out])

    def perform(self, node, inputs, output_storage):
        trace, k = inputs
        output_storage[0][0] = np.asarray(trace)[: int(k)]

    def infer_shape(self, fgraph, node, input_shapes):
        from pytensor_tpu.tensor.math import cast

        k = cast(node.inputs[1], "int64")
        return [(k, *input_shapes[0][1:])]

    def connection_pattern(self, node):
        return [[True], [False]]

    def L_op(self, inputs, outputs, output_grads):
        trace, k = inputs
        (g,) = output_grads
        return [PadTraceGrad()(g, trace, k), DisconnectedType()()]

    def __str__(self):
        return "TruncateToDone"


class PadTraceGrad(Op):
    """Zero-pad a dynamic-length cotangent back to the full trace buffer:
    ``out = zeros_like(like); out[:len(g)] = g``.  The adjoint of
    :class:`TruncateToDone`."""

    __props__ = ()

    def make_node(self, g, like, steps_done):
        from pytensor_tpu.tensor.basic import as_tensor_variable

        g = as_tensor_variable(g)
        like = as_tensor_variable(like)
        steps_done = as_tensor_variable(steps_done)
        out = TensorType(like.type.dtype, like.type.shape)()
        return Apply(self, [g, like, steps_done], [out])

    def perform(self, node, inputs, output_storage):
        g, like, k = inputs
        buf = np.zeros_like(np.asarray(like))
        g = np.asarray(g)
        buf[: g.shape[0]] = g
        output_storage[0][0] = buf

    def infer_shape(self, fgraph, node, input_shapes):
        return [input_shapes[1]]

    def connection_pattern(self, node):
        return [[True], [False], [False]]

    def L_op(self, inputs, outputs, output_grads):
        g, like, k = inputs
        (gg,) = output_grads
        return [TruncateToDone()(gg, k), DisconnectedType()(),
                DisconnectedType()()]

    def __str__(self):
        return "PadTraceGrad"


truncate_to_done = TruncateToDone()


# --- the XLA elimination pass ------------------------------------------------


class WhileScanDynLenError(NotImplementedError):
    pass


def _row_mask(full, k):
    """Boolean (T, 1, 1, ...) mask of live rows, broadcastable to full."""
    from pytensor_tpu.tensor.basic import arange
    from pytensor_tpu.tensor.elemwise import DimShuffle
    from pytensor_tpu.tensor.math import cast, lt
    from pytensor_tpu.tensor.shape import Shape_i

    T = full.type.shape[0]
    iota = arange(T if T is not None else Shape_i(0)(full), dtype="int64")
    mask = lt(iota, cast(k, "int64"))
    if full.type.ndim > 1:
        mask = DimShuffle(1, (0,) + ("x",) * (full.type.ndim - 1))(mask)
    return mask


_REDUCE_NEUTRAL = {
    "add": 0, "mul": 1, "maximum": None, "minimum": None,
    "and_": 1, "or_": 0, "xor": 0,
}


def _neutral_const(op_name, dtype):
    if op_name in ("maximum", "minimum"):
        if dtype.startswith("float"):
            v = -np.inf if op_name == "maximum" else np.inf
        elif dtype == "bool":
            v = False if op_name == "maximum" else True
        else:
            info = np.iinfo(dtype)
            v = info.min if op_name == "maximum" else info.max
    else:
        v = _REDUCE_NEUTRAL[op_name]
    return np.asarray(v, dtype=dtype)


class WhileScanDynLen(GraphRewriter):
    """Eliminate TruncateToDone/PadTraceGrad before XLA lowering.

    Propagates the truncation marker through row-wise ops and rewrites
    collapse points into masked static forms; direct function outputs are
    recorded in ``fgraph.dynlen_output_spec`` for the executor to slice
    host-side after the fetch."""

    name = "while_scan_dynlen"

    def apply(self, fgraph):
        changed = True
        guard = 0
        while changed:
            changed = False
            guard += 1
            if guard > 10000:  # defensive; propagation strictly descends
                raise WhileScanDynLenError("while_scan_dynlen did not converge")
            for node in list(fgraph.apply_nodes):
                if node not in fgraph.apply_nodes:
                    continue
                if isinstance(node.op, TruncateToDone):
                    if self._process(fgraph, node):
                        changed = True

        remaining = [n for n in fgraph.apply_nodes
                     if isinstance(n.op, (TruncateToDone, PadTraceGrad))]
        if remaining:
            ops = {str(n.op) for n in remaining}
            raise WhileScanDynLenError(
                f"while-scan dynamic-length ops survived lowering: {ops}")

    # -- helpers
    @staticmethod
    def _pending(var):
        """True if ``var`` transitively depends on a TruncateToDone whose
        truncation has not yet propagated up to ``var`` — a later sweep
        will rewrite it, so the caller should defer instead of raising."""
        from pytensor_tpu.graph.traversal import ancestors

        return any(
            v.owner is not None
            and isinstance(v.owner.op, (TruncateToDone, PadTraceGrad))
            for v in ancestors([var])
        )

    def _taint(self, fgraph, var):
        """(full, k) if var is a TruncateToDone output, else None."""
        if var.owner is not None and isinstance(var.owner.op, TruncateToDone):
            return var.owner.inputs[0], var.owner.inputs[1]
        return None

    def _process(self, fgraph, node):
        full, k = node.inputs
        out = node.outputs[0]
        clients = list(fgraph.clients.get(out, ()))
        if not clients:
            return False
        progressed = False
        for client in clients:
            if client not in fgraph.clients.get(out, ()):
                continue  # rewired by an earlier replacement this round
            cnode, cidx = client
            if cnode == "output":
                self._handle_output(fgraph, cidx, full, k)
                progressed = True
                continue
            if self._handle_client(fgraph, cnode, out, full, k):
                progressed = True
        return progressed

    def _handle_output(self, fgraph, out_idx, full, k):
        spec = getattr(fgraph, "dynlen_output_spec", None)
        if spec is None:
            spec = fgraph.dynlen_output_spec = {}
        # fetch steps_done alongside; reuse an existing output slot if the
        # same k is already fetched
        k_idx = None
        for i, o in enumerate(fgraph.outputs):
            if o is k:
                k_idx = i
                break
        if k_idx is None:
            fgraph.add_output(k, reason="while_scan_dynlen")
            k_idx = len(fgraph.outputs) - 1
        fgraph.change_node_input("output", out_idx, full,
                                 reason="while_scan_dynlen", check=False)
        spec[out_idx] = k_idx

    def _handle_client(self, fgraph, cnode, out, full, k):
        from pytensor_tpu.tensor.basic import MakeVector
        from pytensor_tpu.tensor.elemwise import CAReduce, DimShuffle, Elemwise
        from pytensor_tpu.tensor.math import cast
        from pytensor_tpu.tensor.shape import Shape, Shape_i
        from pytensor_tpu.tensor.subtensor import DYN, IncSubtensor, Subtensor

        op = cnode.op

        if isinstance(op, PadTraceGrad):
            return self._rewrite_pad(fgraph, cnode)
        if isinstance(op, Elemwise):
            return self._rewrite_elemwise(fgraph, cnode)
        if isinstance(op, CAReduce):
            return self._rewrite_careduce(fgraph, cnode, full, k)
        if isinstance(op, DimShuffle):
            if op.new_order and op.new_order[0] == 0:
                new = DimShuffle(full.type.ndim, op.new_order)(full)
                wrapped = truncate_to_done(new, k)
                fgraph.replace(cnode.outputs[0], wrapped,
                               reason="while_scan_dynlen")
                return True
            raise WhileScanDynLenError(
                f"while-scan output consumed by DimShuffle{op.new_order} "
                "that moves the time axis; XLA cannot express the dynamic "
                "length. Restructure, or compile with mode='FAST_COMPILE'.")
        if isinstance(op, Subtensor):
            return self._rewrite_subtensor(fgraph, cnode, full, k)
        if isinstance(op, IncSubtensor):
            return self._rewrite_inc_subtensor(fgraph, cnode, out, full, k)
        if isinstance(op, Shape):
            entries = [cast(k, "int64")] + [
                Shape_i(d)(full) for d in range(1, full.type.ndim)
            ]
            new = MakeVector("int64")(*entries)
            fgraph.replace(cnode.outputs[0], new, reason="while_scan_dynlen")
            return True
        if isinstance(op, Shape_i):
            new = cast(k, "int64") if op.i == 0 else Shape_i(op.i)(full)
            fgraph.replace(cnode.outputs[0], new, reason="while_scan_dynlen")
            return True
        if isinstance(op, TruncateToDone):
            # trunc of trunc: inner k wins only if smaller; they are the
            # same scan's counter in practice — collapse to one
            fgraph.change_node_input(cnode, 0, full,
                                     reason="while_scan_dynlen", check=False)
            return True
        raise WhileScanDynLenError(
            f"while-scan executed-prefix output consumed by {op}, which "
            "the XLA path cannot express with static shapes. Supported "
            "consumers: elementwise ops, reductions, scalar indexing, "
            "shape, and function outputs. Run this graph with the oracle "
            "(mode='FAST_COMPILE') or restructure the loop.")

    def _rewrite_elemwise(self, fgraph, cnode):
        ks = []
        new_inputs = []
        for inp in cnode.inputs:
            t = self._taint(fgraph, inp)
            if t is not None:
                new_inputs.append(t[0])
                ks.append(t[1])
            else:
                # untainted operands must not carry a real time extent:
                # a broadcastable leading dim (or a constant) is safe
                if inp.type.ndim and inp.type.shape[0] not in (1,) and \
                        not isinstance(inp, Constant):
                    if self._pending(inp):
                        # a TruncateToDone deeper in this operand has not
                        # been processed yet — defer to a later sweep
                        return False
                    raise WhileScanDynLenError(
                        "elementwise mix of a while-scan executed-prefix "
                        f"output and a full-length tensor {inp}; lengths "
                        "differ at runtime. Truncate both or neither.")
                new_inputs.append(inp)
        k0 = ks[0]
        if any(kk is not k0 for kk in ks[1:]):
            raise WhileScanDynLenError(
                "elementwise combines executed-prefix outputs of different "
                "while-scans; XLA cannot align their dynamic lengths.")
        new_out = cnode.op.make_node(*new_inputs).outputs[0]
        wrapped = truncate_to_done(new_out, k0)
        fgraph.replace(cnode.outputs[0], wrapped, reason="while_scan_dynlen")
        return True

    def _rewrite_careduce(self, fgraph, cnode, full, k):
        from pytensor_tpu.tensor.basic import constant
        from pytensor_tpu.tensor.elemwise import CAReduce
        from pytensor_tpu.tensor.math import switch

        op = cnode.op
        axis = op.axis if op.axis is not None else tuple(range(full.type.ndim))
        rebuilt = CAReduce(op.scalar_op, op.axis, op.dtype, op.acc_dtype,
                           op.upcast_discrete_output)
        if 0 not in axis:
            # time axis survives: reduce the full buffer, stay truncated
            new = rebuilt(full)
            fgraph.replace(cnode.outputs[0], truncate_to_done(new, k),
                           reason="while_scan_dynlen")
            return True
        name = getattr(op.scalar_op, "name", None) or str(op.scalar_op)
        if name not in _REDUCE_NEUTRAL:
            raise WhileScanDynLenError(
                f"reduction {op.scalar_op} of a while-scan executed-prefix "
                "output has no masking identity on the XLA path.")
        neutral = constant(_neutral_const(name, full.type.dtype))
        masked = switch(_row_mask(full, k), full, neutral)
        new = rebuilt(masked)
        fgraph.replace(cnode.outputs[0], new, reason="while_scan_dynlen")
        return True

    def _rewrite_subtensor(self, fgraph, cnode, full, k):
        from pytensor_tpu.tensor.math import add as tm_add
        from pytensor_tpu.tensor.math import cast
        from pytensor_tpu.tensor.subtensor import DYN, Subtensor

        op = cnode.op
        if not op.idx_list:
            fgraph.replace(cnode.outputs[0],
                           truncate_to_done(full, k),
                           reason="while_scan_dynlen")
            return True
        first = op.idx_list[0]
        dyn = list(cnode.inputs[1:])
        if isinstance(first, (int, np.integer)):
            i = int(first)
            if i >= 0:
                new = Subtensor(op.idx_list)(full, *dyn)
            else:
                # row i from the end of the EXECUTED prefix
                idx = tm_add(cast(k, "int64"), i)
                new = Subtensor((DYN,) + op.idx_list[1:])(full, idx, *dyn)
            fgraph.replace(cnode.outputs[0], new, reason="while_scan_dynlen")
            return True
        if first == DYN:
            # a dynamic scalar index: valid domain is [0, k); identical on
            # the padded buffer for in-range indices
            new = Subtensor(op.idx_list)(full, *dyn)
            fgraph.replace(cnode.outputs[0], new, reason="while_scan_dynlen")
            return True
        if first == ("slice", None, None, None):
            rest = Subtensor(op.idx_list)(full, *dyn)
            fgraph.replace(cnode.outputs[0], truncate_to_done(rest, k),
                           reason="while_scan_dynlen")
            return True
        raise WhileScanDynLenError(
            f"slicing a while-scan executed-prefix output with {op} is not "
            "supported on the XLA path (dynamic result length). Index with "
            "scalars, reduce, or return it from the function directly.")

    def _rewrite_inc_subtensor(self, fgraph, cnode, out, full, k):
        """set/inc into an executed-prefix buffer (the common case is the
        pullback of ``trace[i]``: ``IncSubtensor{i}(zeros_like(trace), g)``).
        Scalar time indices map onto the padded buffer — negative ones
        relative to the EXECUTED length ``k`` — and the result stays
        truncated."""
        from pytensor_tpu.tensor.math import add as tm_add
        from pytensor_tpu.tensor.math import cast
        from pytensor_tpu.tensor.subtensor import DYN, IncSubtensor

        op = cnode.op
        x, y, *dyn = cnode.inputs
        if x is not out:
            raise WhileScanDynLenError(
                "while-scan executed-prefix output used as the update value "
                f"of {op}; the XLA path cannot express its dynamic extent.")
        if self._taint(fgraph, y) is not None:
            raise WhileScanDynLenError(
                "set/inc of one executed-prefix value into another is not "
                "supported on the XLA path.")
        idx_list = op.idx_list
        first = idx_list[0] if idx_list else None
        if isinstance(first, (int, np.integer)) and int(first) < 0:
            idx = tm_add(cast(k, "int64"), int(first))
            new = IncSubtensor((DYN,) + tuple(idx_list[1:]),
                               op.set_instead_of_inc)(full, y, idx, *dyn)
        elif (first is None or first == DYN
              or isinstance(first, (int, np.integer))):
            # non-negative static or dynamic scalar index (domain [0, k)):
            # identical on the padded buffer
            new = IncSubtensor(idx_list, op.set_instead_of_inc)(full, y, *dyn)
        else:
            raise WhileScanDynLenError(
                f"slice-update of a while-scan executed-prefix output ({op}) "
                "is not supported on the XLA path (dynamic update extent). "
                "Update with scalar indices or restructure the loop.")
        fgraph.replace(cnode.outputs[0], truncate_to_done(new, k),
                       reason="while_scan_dynlen")
        return True

    def _rewrite_pad(self, fgraph, cnode):
        from pytensor_tpu.tensor.basic import zeros_like
        from pytensor_tpu.tensor.math import switch

        g, like, k = cnode.inputs
        t = self._taint(fgraph, g)
        if t is None:
            raise WhileScanDynLenError(
                "PadTraceGrad input is not an executed-prefix value; the "
                "XLA path cannot recover its dynamic length.")
        g_full, gk = t
        masked = switch(_row_mask(g_full, gk), g_full, zeros_like(g_full))
        fgraph.replace(cnode.outputs[0], masked, reason="while_scan_dynlen")
        return True


def _register():
    from pytensor_tpu.compile.mode import optdb

    # tag "xla" only: the XLA linker's required_rewrites pulls this in;
    # oracle modes keep the exact dynamic-shape ops (perform handles them).
    # Position 48.6: after all semantic rewrites, before merge2/fusion so
    # the emitted masks still fuse.
    optdb.register("while_scan_dynlen", WhileScanDynLen(), "xla",
                   position=48.6)


_register()
