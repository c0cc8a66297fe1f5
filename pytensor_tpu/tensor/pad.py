"""pad (reference tensor/pad.py Pad:365 — OpFromGraph over modes).

Implemented as a graph constructor over concatenate/alloc/slice, so
gradients come for free and XLA fuses the copies.
"""

from __future__ import annotations

import numpy as np

from pytensor_tpu.tensor.basic import alloc, as_tensor_variable, concatenate, zeros
from pytensor_tpu.tensor.shape import shape
from pytensor_tpu.tensor.subtensor import flip


def _norm_pad_width(pad_width, ndim):
    if isinstance(pad_width, (int, np.integer)):
        return [(int(pad_width), int(pad_width))] * ndim
    pad_width = list(pad_width)
    if len(pad_width) == 2 and all(isinstance(p, (int, np.integer)) for p in pad_width):
        return [tuple(int(p) for p in pad_width)] * ndim
    return [tuple(int(x) for x in p) for p in pad_width]


def pad(x, pad_width, mode="constant", constant_values=0, **kwargs):
    x = as_tensor_variable(x)
    pw = _norm_pad_width(pad_width, x.type.ndim)
    out = x
    for axis, (lo, hi) in enumerate(pw):
        if lo == 0 and hi == 0:
            continue
        shp = [shape(out)[i] for i in range(out.type.ndim)]
        if mode == "constant":
            cv = as_tensor_variable(constant_values)
            parts = []
            if lo:
                lo_shape = list(shp)
                lo_shape[axis] = lo
                parts.append(alloc(cv.astype(out.type.dtype), *lo_shape))
            parts.append(out)
            if hi:
                hi_shape = list(shp)
                hi_shape[axis] = hi
                parts.append(alloc(cv.astype(out.type.dtype), *hi_shape))
            out = concatenate(parts, axis=axis)
        elif mode in ("reflect", "symmetric"):
            off = 0 if mode == "symmetric" else 1
            idx_lo = [slice(None)] * out.type.ndim
            idx_lo[axis] = slice(off, lo + off)
            idx_hi = [slice(None)] * out.type.ndim
            idx_hi[axis] = slice(-(hi + off), -off if off else None)
            parts = []
            if lo:
                parts.append(flip(out[tuple(idx_lo)], axis))
            parts.append(out)
            if hi:
                parts.append(flip(out[tuple(idx_hi)], axis))
            out = concatenate(parts, axis=axis)
        elif mode == "edge":
            parts = []
            idx_first = [slice(None)] * out.type.ndim
            idx_first[axis] = slice(0, 1)
            idx_last = [slice(None)] * out.type.ndim
            idx_last[axis] = slice(-1, None)
            from pytensor_tpu.tensor.basic import tile

            if lo:
                reps = [1] * out.type.ndim
                reps[axis] = lo
                parts.append(tile(out[tuple(idx_first)], tuple(reps)))
            parts.append(out)
            if hi:
                reps = [1] * out.type.ndim
                reps[axis] = hi
                parts.append(tile(out[tuple(idx_last)], tuple(reps)))
            out = concatenate(parts, axis=axis)
        elif mode == "wrap":
            idx_lo = [slice(None)] * out.type.ndim
            idx_lo[axis] = slice(-lo, None)
            idx_hi = [slice(None)] * out.type.ndim
            idx_hi[axis] = slice(0, hi)
            parts = []
            if lo:
                parts.append(out[tuple(idx_lo)])
            parts.append(out)
            if hi:
                parts.append(out[tuple(idx_hi)])
            out = concatenate(parts, axis=axis)
        else:
            raise NotImplementedError(f"pad mode {mode!r}")
    return out
