"""Dim-aware signal ops (reference xtensor/signal.py convolve1d:13).

convolve1d contracts one named dim of each input; every other dim
batches by name (the usual xtensor union-broadcast).  Lowering aligns
both operands to (batch..., conv) and rides the Blockwise tensor
Convolve1d, which XLA maps to a single batched conv.
"""

from __future__ import annotations

from pytensor_tpu.graph.basic import Apply
from pytensor_tpu.xtensor.ops import XOp
from pytensor_tpu.xtensor.type import XTensorType, as_xtensor


class XConvolve1d(XOp):
    __props__ = ("dims", "mode")

    def __init__(self, dims, mode="full"):
        if mode not in ("full", "valid", "same"):
            raise ValueError(f"bad mode {mode}")
        if len(dims) != 2 or dims[0] == dims[1]:
            raise ValueError(
                f"convolve1d needs two distinct dims, got {dims}")
        self.dims = tuple(dims)
        self.mode = mode

    def make_node(self, in1, in2):
        in1 = as_xtensor(in1)
        in2 = as_xtensor(in2)
        d1, d2 = self.dims
        if d1 not in in1.type.dims:
            raise ValueError(f"dim {d1} not in in1 dims {in1.type.dims}")
        if d2 not in in2.type.dims:
            raise ValueError(f"dim {d2} not in in2 dims {in2.type.dims}")
        if d2 in in1.type.dims or d1 in in2.type.dims:
            raise ValueError(
                "convolution dims must be unique to their operand")
        n = in1.type.shape[in1.type.dims.index(d1)]
        m = in2.type.shape[in2.type.dims.index(d2)]
        if self.mode == "full":
            out_n = None if (n is None or m is None) else n + m - 1
        elif self.mode == "valid":
            out_n = None if (n is None or m is None) else (
                max(n, m) - min(n, m) + 1)
        else:  # same: sized like in1 (xarray/reference convention)
            out_n = n
        # batch dims: union by first appearance (in1 then in2)
        batch = []
        batch_shape = []
        for v, conv_d in ((in1, d1), (in2, d2)):
            for d, s in zip(v.type.dims, v.type.shape):
                if d == conv_d:
                    continue
                if d not in batch:
                    batch.append(d)
                    batch_shape.append(s)
                else:
                    pos = batch.index(d)
                    if batch_shape[pos] is None:
                        batch_shape[pos] = s
        from pytensor_tpu.scalar.basic import upcast

        dtype = upcast(in1.type.dtype, in2.type.dtype)
        out = XTensorType(dtype, (*batch, d1), (*batch_shape, out_n))()
        return Apply(self, [in1, in2], [out])

    def lower(self, node, tensor_inputs):
        from pytensor_tpu.tensor.elemwise import DimShuffle
        from pytensor_tpu.tensor.signal.conv import convolve1d

        in1, in2 = node.inputs
        t1, t2 = tensor_inputs
        d1, d2 = self.dims
        batch = node.outputs[0].type.dims[:-1]

        def align(v, t, conv_d):
            dims = v.type.dims
            order = tuple(
                dims.index(d) if d in dims else "x" for d in batch
            ) + (dims.index(conv_d),)
            if order == tuple(range(len(dims))):
                return t
            return DimShuffle(len(dims), order)(t)

        a = align(in1, t1, d1)
        b = align(in2, t2, d2)
        if self.mode == "same":
            # reference semantics: 'same' = 'valid' with in1 zero-padded
            # so the output is sized and centred like in1
            from pytensor_tpu.tensor.basic import join, zeros

            m = in2.type.shape[in2.type.dims.index(d2)]
            if m is None:
                raise NotImplementedError(
                    "convolve1d mode='same' needs a static kernel length")
            left = m // 2
            right = (m - 1) // 2
            pads = []
            if left:
                pads.append(zeros((*a.type.shape[:-1], left),
                                  dtype=a.type.dtype))
            pads.append(a)
            if right:
                pads.append(zeros((*a.type.shape[:-1], right),
                                  dtype=a.type.dtype))
            a = join(a.type.ndim - 1, *pads) if len(pads) > 1 else a
            return [convolve1d(a, b, mode="valid")]
        return [convolve1d(a, b, mode=self.mode)]


def convolve1d(in1, in2, mode="full", *, dims):
    """Convolve along one named dim of each input (reference
    signal.py:13).  ``dims=(in1_dim, in2_dim)``; the output keeps
    ``in1_dim``; all other dims batch by name."""
    return XConvolve1d(dims, mode)(in1, in2)
