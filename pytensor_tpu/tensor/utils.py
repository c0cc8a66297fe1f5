"""Tensor utilities (reference tensor/utils.py).

The reference's hash_from_ndarray / shape_of_variables helpers; the
as_list normalizer used across op constructors.
"""

from __future__ import annotations

import hashlib

import numpy as np


def hash_from_ndarray(data) -> str:
    """Stable content hash of an ndarray (reference tensor/utils.py:30)."""
    data = np.ascontiguousarray(data)
    h = hashlib.sha256()
    h.update(str(data.shape).encode())
    h.update(str(data.dtype).encode())
    h.update(data.tobytes())
    return h.hexdigest()


def as_list(x):
    """Wrap scalars into a 1-element list; pass lists/tuples through."""
    if isinstance(x, (list, tuple)):
        return list(x)
    return [x]


def normalize_reduce_axis(axis, ndim):
    """None | int | sequence -> sorted tuple of non-negative axes."""
    if axis is None:
        return tuple(range(ndim))
    if isinstance(axis, (int, np.integer)):
        axis = (int(axis),)
    out = []
    for a in axis:
        a = int(a)
        if a < 0:
            a += ndim
        if not (0 <= a < ndim):
            raise np.exceptions.AxisError(a, ndim)
        out.append(a)
    return tuple(sorted(set(out)))
