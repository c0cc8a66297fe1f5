"""Dim-aware indexing with full xarray semantics.

Parallels /root/reference/pytensor/xtensor/indexing.py (Index:113,
IndexUpdate:213) and rewriting/indexing.py (_lower_index:39):

- orthogonal indexing: indexers with DISTINCT output dims combine as an
  outer product (xarray's default);
- vectorized indexing: indexers SHARING an output dim combine pointwise
  (numpy advanced semantics), including against a kept sliced axis of
  ``x`` with the same name (diagonal selection);
- scalar indexers (static ints or 0-d integer tensors) drop the dim;
- 1-d boolean masks select along their own dim (graph-time-constant
  masks only: XLA requires static shapes, so a symbolic mask — whose
  nonzero count is data-dependent — is rejected up front, unlike the
  reference's dynamic ``nonzero`` lowering);
- slices keep the dim in place (static bounds only, for the same
  static-shape reason).

TPU-first lowering: everything becomes one plain-tensor mixed
basic/advanced index (Subtensor/AdvancedSubtensor), which XLA fuses into
a single gather; a transpose restores xarray's dim order when numpy's
non-consecutive-advanced rule fronts the advanced block.
"""

from __future__ import annotations

import numpy as np

from pytensor_tpu.graph.basic import Apply, Constant
from pytensor_tpu.xtensor.ops import XOp
from pytensor_tpu.xtensor.type import (XTensorType, XTensorVariable,
                                       as_xtensor)

_INT_DTYPES = ("int8", "int16", "int32", "int64",
               "uint8", "uint16", "uint32", "uint64")


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


def _is_full_slice(payload):
    return payload == (None, None, None)


class XIndex(XOp):
    """General labeled indexing (reference Index:113).

    ``specs`` has one entry per axis of ``x``:
      ("slice", (start, stop, step))  static slice, keeps the dim
      ("int", v)                      static int, drops the dim
      ("scalar", None)                0-d integer input, drops the dim
      ("array", None)                 labeled integer-array input
    Non-static indexers are extra inputs, consumed in axis order.
    """

    __props__ = ("specs",)

    def __init__(self, specs):
        self.specs = tuple(specs)

    def make_node(self, x, *idxs):
        x = as_xtensor(x)
        if len(self.specs) != x.type.ndim:
            raise IndexError(
                f"too many indices: {len(self.specs)} for {x.type.ndim}-d")
        idxs = [as_xtensor(i) if not isinstance(i, XTensorVariable) else i
                for i in idxs]

        out_dims: list[str] = []
        out_shape: list[int | None] = []

        def combine(dim, size):
            if dim not in out_dims:
                out_dims.append(dim)
                out_shape.append(size)
            else:
                pos = out_dims.index(dim)
                if out_shape[pos] is None:
                    out_shape[pos] = size
                elif size is not None and size != out_shape[pos]:
                    raise IndexError(
                        f"dimension of indexers mismatch for dim {dim}: "
                        f"{out_shape[pos]} vs {size}")

        k = 0
        for axis, (kind, payload) in enumerate(self.specs):
            x_dim = x.type.dims[axis]
            if kind == "slice":
                combine(x_dim, _slice_len(payload, x.type.shape[axis]))
            elif kind == "int":
                pass
            elif kind == "scalar":
                idx = idxs[k]
                k += 1
                if idx.type.ndim != 0 or idx.type.dtype not in _INT_DTYPES:
                    raise TypeError("scalar indexer must be a 0-d integer")
            elif kind == "array":
                idx = idxs[k]
                k += 1
                if idx.type.dtype not in _INT_DTYPES:
                    raise TypeError(
                        f"array indexer for dim {x_dim} must be integer, "
                        f"got {idx.type.dtype}")
                for d, s in zip(idx.type.dims, idx.type.shape):
                    combine(d, s)
            else:
                raise ValueError(f"bad indexer kind {kind}")
        if k != len(idxs):
            raise ValueError("wrong number of indexer inputs")

        out = XTensorType(x.type.dtype, tuple(out_dims), tuple(out_shape))()
        return Apply(self, [x, *idxs], [out])

    # -- lowering (reference rewriting/indexing.py:_lower_index) --------
    def _lowered_view(self, node, tensor_inputs):
        """Return (indexed_tensor, its_dims): the plain-tensor gather plus
        the dim labels of its axes (numpy may front the advanced block)."""
        from pytensor_tpu.tensor.basic import arange
        from pytensor_tpu.tensor.elemwise import DimShuffle
        from pytensor_tpu.tensor.shape import shape_i

        x = node.inputs[0]
        t = tensor_inputs[0]
        extras = tensor_inputs[1:]
        extra_vars = node.inputs[1:]
        out = node.outputs[0]
        out_dims = out.type.dims
        out_ndim = len(out_dims)

        if all(kind in ("slice", "int", "scalar") for kind, _ in self.specs):
            # pure basic indexing
            it = iter(extras)
            idx = []
            for kind, payload in self.specs:
                if kind == "slice":
                    idx.append(slice(*payload))
                elif kind == "int":
                    idx.append(payload)
                else:
                    idx.append(next(it))
            return t[tuple(idx)], out_dims

        # dims indexed by some array indexer (for slice->arange promotion)
        array_dims: set[str] = set()
        ei = 0
        for kind, payload in self.specs:
            if kind in ("scalar", "array"):
                if kind == "array":
                    array_dims |= set(extra_vars[ei].type.dims)
                ei += 1

        aligned = []
        basic_axis = []
        ei = 0
        for axis, (kind, payload) in enumerate(self.specs):
            x_dim = x.type.dims[axis]
            if kind == "slice":
                if x_dim not in array_dims:
                    aligned.append(slice(*payload))
                    basic_axis.append(out_dims.index(x_dim))
                else:
                    # promote to an aligned advanced index (vectorized
                    # interaction with the array indexer on this dim)
                    n = x.type.shape[axis]
                    length = n if n is not None else shape_i(t, axis)
                    adv = arange(length)[slice(*payload)]
                    order = ["x"] * out_ndim
                    order[out_dims.index(x_dim)] = 0
                    aligned.append(DimShuffle(1, tuple(order))(adv))
            elif kind == "int":
                aligned.append(np.int64(payload))  # 0-d advanced
            elif kind == "scalar":
                aligned.append(extras[ei])
                ei += 1
            else:
                arr_t = extras[ei]
                arr_dims = extra_vars[ei].type.dims
                ei += 1
                order = ["x"] * out_ndim
                for j, d in enumerate(arr_dims):
                    order[out_dims.index(d)] = j
                aligned.append(DimShuffle(len(arr_dims), tuple(order))(arr_t))

        if basic_axis:
            # drop the alignment axes reserved for basic-kept dims
            def _squeeze(a):
                if isinstance(a, slice) or np.ndim(a) == 0:
                    return a
                order = tuple(i for i in range(a.type.ndim)
                              if i not in basic_axis)
                return DimShuffle(a.type.ndim, order)(a)

            aligned = [_squeeze(a) for a in aligned]

        r = t[tuple(aligned)]

        # numpy axis order of the result
        adv_positions = [i for i, a in enumerate(aligned)
                         if not isinstance(a, slice)]
        consecutive = adv_positions == list(
            range(adv_positions[0], adv_positions[0] + len(adv_positions)))
        basic_dims_in_order = [out_dims[i] for i in sorted(basic_axis)]
        adv_dims = [d for d in out_dims if d not in basic_dims_in_order]
        if not basic_axis:
            r_dims = list(out_dims)
        elif not consecutive:
            # advanced block moves to the front
            r_dims = adv_dims + basic_dims_in_order
        else:
            # advanced block sits at the position of the first advanced
            # index, surrounded by the kept basic dims in axis order
            n_before = sum(1 for i, a in enumerate(aligned)
                           if isinstance(a, slice) and i < adv_positions[0])
            r_dims = (basic_dims_in_order[:n_before] + adv_dims
                      + basic_dims_in_order[n_before:])
        return r, tuple(r_dims)

    def lower(self, node, tensor_inputs):
        from pytensor_tpu.tensor.elemwise import DimShuffle
        from pytensor_tpu.tensor.shape import specify_shape

        out = node.outputs[0]
        r, r_dims = self._lowered_view(node, tensor_inputs)
        if tuple(r_dims) != out.type.dims:
            order = tuple(r_dims.index(d) for d in out.type.dims)
            r = DimShuffle(r.type.ndim, order)(r)
        if any(s is not None for s in out.type.shape):
            r = specify_shape(r, out.type.shape)
        return [r]


class XIndexUpdate(XOp):
    """Set/inc an indexed region by dim name (reference IndexUpdate:213).

    Inputs: (x, *indexer_inputs, value); ``specs`` as in XIndex."""

    __props__ = ("specs", "mode")

    def __init__(self, specs, mode):
        if mode not in ("set", "inc"):
            raise ValueError("mode must be 'set' or 'inc'")
        self.specs = tuple(specs)
        self.mode = mode

    def make_node(self, x, *rest):
        x = as_xtensor(x)
        rest = list(rest)
        value = rest.pop()
        idxs = rest
        view_node = XIndex(self.specs).make_node(x, *idxs)
        view = view_node.outputs[0]
        try:
            value = as_xtensor(value)
        except (TypeError, ValueError):
            from pytensor_tpu.tensor.basic import as_tensor_variable

            value = as_xtensor(as_tensor_variable(value),
                               dims=view.type.dims)
        extra = [d for d in value.type.dims if d not in view.type.dims]
        if extra:
            raise ValueError(
                f"value dims {extra} not present in the indexed region "
                f"{view.type.dims}")
        out = x.type()
        return Apply(self, [x, *idxs, value], [out])

    def lower(self, node, tensor_inputs):
        from pytensor_tpu.tensor.elemwise import DimShuffle
        from pytensor_tpu.tensor.subtensor import inc_subtensor, set_subtensor

        x = node.inputs[0]
        v_var = node.inputs[-1]
        v = tensor_inputs[-1]
        view_node = XIndex(self.specs).make_node(x, *node.inputs[1:-1])
        target, target_dims = XIndex(self.specs)._lowered_view(
            view_node, tensor_inputs[:-1])
        # align value to the target's ACTUAL axis order (which may be the
        # numpy-fronted one, not the xarray out order)
        v_dims = v_var.type.dims
        order = tuple(v_dims.index(d) if d in v_dims else "x"
                      for d in target_dims)
        while order and order[0] == "x":
            order = order[1:]
        if order != tuple(range(v.type.ndim)):
            v = DimShuffle(v.type.ndim, order)(v)
        fn = set_subtensor if self.mode == "set" else inc_subtensor
        return [fn(target, v)]


# ---------------------------------------------------------------------------
# helpers: build specs from user indexers
# ---------------------------------------------------------------------------

def _static_slice(s):
    for part in (s.start, s.stop, s.step):
        if part is not None and not isinstance(part, (int, np.integer)):
            raise NotImplementedError(
                "xtensor slices need static (python int) bounds: a symbolic "
                "bound makes the output shape dynamic, which XLA cannot "
                "compile; precompute the bound or use isel with an arange "
                "indexer")
    return ("slice", (None if s.start is None else int(s.start),
                      None if s.stop is None else int(s.stop),
                      None if s.step is None else int(s.step)))


def _as_indexer(idx, x, dim):
    """Normalize one user indexer for dim `dim` -> (spec, input or None)."""
    from pytensor_tpu.graph.basic import Variable
    from pytensor_tpu.tensor.basic import as_tensor_variable

    if idx is None:
        raise TypeError(
            "XTensors do not support indexing with None (np.newaxis); "
            "use expand_dims instead")
    if isinstance(idx, (int, np.integer)) and not isinstance(
            idx, (bool, np.bool_)):
        return ("int", int(idx)), None
    if isinstance(idx, slice):
        return _static_slice(idx), None
    # ("other_dim", values) — xarray's dim-renaming indexer
    if (isinstance(idx, tuple) and len(idx) == 2
            and (isinstance(idx[0], str)
                 or (isinstance(idx[0], (tuple, list))
                     and all(isinstance(d, str) for d in idx[0])))):
        dims, vals = idx
        if isinstance(vals, XTensorVariable):
            raise IndexError(
                "giving a dimension name to an XTensorVariable indexer is "
                "not supported; use .rename() instead")
        dims = (dims,) if isinstance(dims, str) else tuple(dims)
        vals = as_xtensor(as_tensor_variable(vals), dims=dims)
        return ("array", None), vals
    if isinstance(idx, XTensorVariable):
        if idx.type.dtype == "bool":
            return _bool_mask_indexer(idx, dim)
        if idx.type.ndim == 0:
            return ("scalar", None), idx
        return ("array", None), idx
    # unlabeled: ndarray / list / plain tensor
    if isinstance(idx, Variable):
        tv = as_tensor_variable(idx)
    else:
        arr = np.asarray(idx)
        if arr.dtype.kind == "b":
            return _bool_mask_indexer(
                as_xtensor(as_tensor_variable(arr),
                           dims=(dim,) if arr.ndim else ()), dim)
        tv = as_tensor_variable(arr)
    if tv.type.ndim > 1:
        raise IndexError(
            "Unlabeled multi-dimensional array cannot be used for indexing")
    if tv.type.dtype == "bool":
        return _bool_mask_indexer(
            as_xtensor(tv, dims=(dim,) if tv.type.ndim else ()), dim)
    if tv.type.ndim == 0:
        return ("scalar", None), as_xtensor(tv)
    # implicit dim = the indexed one
    return ("array", None), as_xtensor(tv, dims=(dim,))


def _bool_mask_indexer(mask, dim):
    """Constant 1-d bool mask -> integer indexer on the same dim."""
    from pytensor_tpu.tensor.basic import as_tensor_variable

    if mask.type.ndim != 1:
        raise NotImplementedError(
            "only 1-d boolean indexing arrays are supported")
    if mask.type.dims != (dim,):
        raise IndexError(
            f"boolean indexer should be unlabeled or on the indexed "
            f"dimension; indexer is on {mask.type.dims} but the target "
            f"dimension is {dim}")
    base = mask
    while base.owner is not None and len(base.owner.inputs) == 1 and \
            type(base.owner.op).__name__ in ("XTensorFromTensor",):
        base = base.owner.inputs[0]
    data = None
    if isinstance(base, Constant):
        data = np.asarray(base.data)
    if data is None:
        raise NotImplementedError(
            "boolean mask indexing needs a graph-time-constant mask: the "
            "number of selected elements is data-dependent, which XLA "
            "cannot compile to a static shape (reference lowers to a "
            "dynamic nonzero; this framework requires static shapes)")
    idx = np.nonzero(data)[0].astype("int64")
    return ("array", None), as_xtensor(as_tensor_variable(idx), dims=(dim,))


def _build_specs(x, indexers, kwargs):
    """Per-dim mapping -> (specs, extra_inputs)."""
    x = as_xtensor(x)
    m = dict(indexers or {})
    m.update(kwargs)
    unknown = [d for d in m if d not in x.type.dims]
    if unknown:
        raise ValueError(
            f"isel: unknown dims {unknown}; tensor has {x.type.dims}")
    specs = []
    inputs = []
    for axis, dim in enumerate(x.type.dims):
        if dim in m:
            spec, inp = _as_indexer(m[dim], x, dim)
            specs.append(spec)
            if inp is not None:
                inputs.append(inp)
        else:
            specs.append(("slice", (None, None, None)))
    return x, tuple(specs), inputs


def _positional_specs(x, idxs):
    """Positional (getitem-style) indexers -> (specs, extra_inputs)."""
    x = as_xtensor(x)
    idxs = list(idxs)
    if any(i is Ellipsis for i in idxs):
        if idxs.count(Ellipsis) > 1:
            raise IndexError(
                "an index can only have a single ellipsis ('...')")
        loc = idxs.index(Ellipsis)
        fill = x.type.ndim - (len(idxs) - 1)
        idxs = (idxs[:loc] + [slice(None)] * fill + idxs[loc + 1:])
    if len(idxs) > x.type.ndim:
        raise IndexError("too many indices")
    idxs = idxs + [slice(None)] * (x.type.ndim - len(idxs))
    specs = []
    inputs = []
    for axis, idx in enumerate(idxs):
        spec, inp = _as_indexer(idx, x, x.type.dims[axis])
        specs.append(spec)
        if inp is not None:
            inputs.append(inp)
    return x, tuple(specs), inputs


def isel(x, indexers=None, **kwargs):
    """Outer/vectorized selection by dim name (xarray ``isel``)."""
    x, specs, inputs = _build_specs(x, indexers, kwargs)
    if all(k == "slice" and _is_full_slice(p) for k, p in specs):
        return x
    return XIndex(specs)(x, *inputs)


def index(x, *idxs):
    """Positional indexing (``x[...]``): slices, ints, 0-d tensors,
    labeled arrays, constant bool masks, ``("dim", values)`` tuples."""
    x, specs, inputs = _positional_specs(x, idxs)
    if all(k == "slice" and _is_full_slice(p) for k, p in specs):
        return x
    return XIndex(specs)(x, *inputs)


def index_update(x, indexers, value, mode="set", **kwargs):
    x, specs, inputs = _build_specs(x, indexers, kwargs)
    return XIndexUpdate(specs, mode)(x, *inputs, value)


def index_set(x, indexers, value, **kwargs):
    return index_update(x, indexers, value, mode="set", **kwargs)


def index_inc(x, indexers, value, **kwargs):
    return index_update(x, indexers, value, mode="inc", **kwargs)


# reference-name aliases (reference xtensor/indexing.py exposes
# index_assignment / index_increment)
index_assignment = index_set
index_increment = index_inc
