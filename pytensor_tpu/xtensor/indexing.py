"""Dim-aware indexing: isel with ints / slices / integer-array indexers,
and index_update (set/inc) by dim name.

Parallels /root/reference/pytensor/xtensor/indexing.py (Index:113,
IndexUpdate:213).  Indexers are applied per-dim (outer/orthogonal
semantics, xarray's default for non-DataArray indexers).
"""

from __future__ import annotations

import numpy as np

from pytensor_tpu.graph.basic import Apply
from pytensor_tpu.xtensor.ops import XOp
from pytensor_tpu.xtensor.type import XTensorType, as_xtensor


def _slice_len(payload, size):
    start, stop, step = payload
    if size is None and (stop is None or (stop is not None and stop < 0)
                         or (start is not None and start < 0)):
        return None
    try:
        return len(range(*slice(start, stop, step).indices(
            size if size is not None else 2 ** 62)))
    except Exception:
        return None


class XIndexDim(XOp):
    """Index one named dim: int (drops it), slice (keeps it), or a 1-d
    integer xtensor (replaces it by the indexer's dim)."""

    __props__ = ("dim", "kind", "payload")

    def __init__(self, dim, kind, payload=None):
        if kind not in ("int", "slice", "array"):
            raise ValueError(f"bad indexer kind {kind}")
        self.dim = dim
        self.kind = kind
        self.payload = payload

    def make_node(self, x, *idx):
        x = as_xtensor(x)
        if self.dim not in x.type.dims:
            raise ValueError(f"isel: unknown dim {self.dim}")
        axis = x.type.dims.index(self.dim)
        dims = list(x.type.dims)
        shape = list(x.type.shape)
        inputs = [x]
        if self.kind == "int":
            del dims[axis], shape[axis]
        elif self.kind == "slice":
            shape[axis] = _slice_len(self.payload, shape[axis])
        else:
            (indexer,) = idx
            indexer = as_xtensor(indexer)
            if indexer.type.ndim != 1 or indexer.type.dtype not in (
                    "int8", "int16", "int32", "int64"):
                raise TypeError("array indexer must be a 1-d integer xtensor")
            dims[axis] = indexer.type.dims[0]
            shape[axis] = indexer.type.shape[0]
            inputs.append(indexer)
        out = XTensorType(x.type.dtype, tuple(dims), tuple(shape))()
        return Apply(self, inputs, [out])

    def lower(self, node, tensor_inputs):
        t = tensor_inputs[0]
        x = node.inputs[0]
        axis = x.type.dims.index(self.dim)
        if self.kind == "int":
            idx = self.payload
        elif self.kind == "slice":
            idx = slice(*self.payload)
        else:
            idx = tensor_inputs[1]
        return [t[(slice(None),) * axis + (idx,)]]


def isel(x, indexers=None, **kwargs):
    """Outer (per-dim) selection by name; indexers may be ints, slices,
    integer lists/arrays, or 1-d integer xtensors."""
    x = as_xtensor(x)
    m = dict(indexers or {})
    m.update(kwargs)
    out = x
    for dim, idx in m.items():
        if isinstance(idx, (int, np.integer)):
            out = XIndexDim(dim, "int", int(idx))(out)
        elif isinstance(idx, slice):
            out = XIndexDim(dim, "slice",
                            (idx.start, idx.stop, idx.step))(out)
        else:
            if isinstance(idx, (list, tuple, np.ndarray)):
                idx = as_xtensor(np.asarray(idx, dtype="int64"), dims=(dim,))
            out = XIndexDim(dim, "array")(out, idx)
    return out


class XIndexUpdate(XOp):
    """Set/inc a per-dim-indexed region (reference IndexUpdate:213).

    ``specs`` is a tuple of (dim, kind, payload); array indexers are extra
    xtensor inputs in spec order, then the value."""

    __props__ = ("specs", "mode")

    def __init__(self, specs, mode):
        if mode not in ("set", "inc"):
            raise ValueError("mode must be 'set' or 'inc'")
        self.specs = tuple(specs)
        self.mode = mode
        if sum(1 for _, kind, _ in self.specs if kind == "array") > 1:
            raise NotImplementedError(
                "index_update supports at most one array indexer")

    def make_node(self, x, *rest):
        x = as_xtensor(x)
        rest = list(rest)
        value = as_xtensor(rest.pop())
        arrays = [as_xtensor(a) for a in rest]
        # region dims: apply specs to x's dims
        dims = list(x.type.dims)
        ai = 0
        for dim, kind, payload in self.specs:
            axis = dims.index(dim)
            if kind == "int":
                del dims[axis]
            elif kind == "array":
                dims[axis] = arrays[ai].type.dims[0]
                ai += 1
        extra = [d for d in value.type.dims if d not in dims]
        if extra:
            raise ValueError(
                f"value dims {extra} not present in the indexed region {dims}")
        out = x.type()
        return Apply(self, [x, *arrays, value], [out])

    def lower(self, node, tensor_inputs):
        from pytensor_tpu.tensor.elemwise import DimShuffle
        from pytensor_tpu.tensor.subtensor import inc_subtensor, set_subtensor

        x = node.inputs[0]
        t = tensor_inputs[0]
        arrays = tensor_inputs[1:-1]
        v = tensor_inputs[-1]
        # build the region's dim list and the index tuple
        dims = list(x.type.dims)
        idx = [slice(None)] * len(dims)
        ai = 0
        for dim, kind, payload in self.specs:
            if kind == "int":
                idx[x.type.dims.index(dim)] = payload
            elif kind == "slice":
                idx[x.type.dims.index(dim)] = slice(*payload)
            else:
                idx[x.type.dims.index(dim)] = arrays[ai]
                ai += 1
        # region dims after indexing
        region_dims = []
        ai = 0
        spec_by_dim = {d: (k, p) for d, k, p in self.specs}
        for d in x.type.dims:
            if d in spec_by_dim:
                kind, _ = spec_by_dim[d]
                if kind == "int":
                    continue
                if kind == "array":
                    region_dims.append(node.inputs[1 + ai].type.dims[0])
                    ai += 1
                    continue
            region_dims.append(d)
        # align value to region dims
        v_dims = node.inputs[-1].type.dims
        order = ["x" if d not in v_dims else v_dims.index(d)
                 for d in region_dims]
        if order != list(range(len(v_dims))):
            v = DimShuffle(v.type.ndim, order)(v)
        target = t[tuple(idx)]
        fn = set_subtensor if self.mode == "set" else inc_subtensor
        return [fn(target, v)]


def _norm_specs(x, indexers, kwargs):
    x = as_xtensor(x)
    m = dict(indexers or {})
    m.update(kwargs)
    specs = []
    arrays = []
    for dim, idx in m.items():
        if isinstance(idx, (int, np.integer)):
            specs.append((dim, "int", int(idx)))
        elif isinstance(idx, slice):
            specs.append((dim, "slice", (idx.start, idx.stop, idx.step)))
        else:
            if isinstance(idx, (list, tuple, np.ndarray)):
                idx = as_xtensor(np.asarray(idx, dtype="int64"), dims=(dim,))
            specs.append((dim, "array", None))
            arrays.append(idx)
    return x, tuple(specs), arrays


def index_update(x, indexers, value, mode="set", **kwargs):
    x, specs, arrays = _norm_specs(x, indexers, kwargs)
    return XIndexUpdate(specs, mode)(x, *arrays, value)


def index_set(x, indexers, value, **kwargs):
    return index_update(x, indexers, value, mode="set", **kwargs)


def index_inc(x, indexers, value, **kwargs):
    return index_update(x, indexers, value, mode="inc", **kwargs)
