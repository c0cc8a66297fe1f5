"""Structured sparse indexing ops — no densification.

Parallels /root/reference/pytensor/sparse/basic.py GetItemList,
GetItemListGrad, GetItem2Lists, GetItem2ListsGrad, Diag,
ConstructSparseFromList.  The reference's implementations are
scipy-backed with C specializations; here the oracle is scipy and the
device path is expressed in MXU/BCOO-friendly forms:

- row selection        = S @ X        (S a one-hot BCOO selection matrix;
                                       exact with repeated rows, static nse)
- its gradient         = S^T @ gz
- (row, col) lookups   = one-hot mask contraction (q x nnz matmul)
- diagonal             = masked segment-sum over nnz
- scatter rows to rows = static-nse BCOO construction
"""

from __future__ import annotations

import numpy as np

from pytensor_tpu.graph.basic import Apply
from pytensor_tpu.graph.op import Op
from pytensor_tpu.sparse.basic import _as_sparse_variable
from pytensor_tpu.sparse.type import SparseTensorType
from pytensor_tpu.tensor.basic import as_tensor_variable
from pytensor_tpu.tensor.type import TensorType


class GetItemList(Op):
    """Select rows of a sparse matrix by an integer vector -> sparse."""

    __props__ = ()

    def make_node(self, x, idx):
        x = _as_sparse_variable(x)
        idx = as_tensor_variable(idx)
        if idx.type.ndim != 1 or not idx.type.dtype.startswith(("int", "uint")):
            raise TypeError("index must be an integer vector")
        m = idx.type.shape[0]
        out = SparseTensorType(x.type.format, x.type.dtype,
                               (m, x.type.shape[1]))()
        return Apply(self, [x, idx], [out])

    def perform(self, node, inputs, output_storage):
        x, idx = inputs
        output_storage[0][0] = x[np.asarray(idx)].asformat(
            node.outputs[0].type.format)

    def infer_shape(self, fgraph, node, input_shapes):
        return [(input_shapes[1][0], input_shapes[0][1])]

    def L_op(self, inputs, outputs, output_grads):
        from pytensor_tpu.gradient import grad_undefined

        x, idx = inputs
        (gz,) = output_grads
        return [GetItemListGrad()(x, idx, gz),
                grad_undefined(self, 1, idx, "integer index")]


get_item_list = GetItemList()


class GetItemListGrad(Op):
    """Scatter the rows of gz back to the positions in idx (accumulating
    repeats) -> sparse with x's shape."""

    __props__ = ()

    def make_node(self, x, idx, gz):
        x = _as_sparse_variable(x)
        idx = as_tensor_variable(idx)
        gz = _as_sparse_variable(gz)
        return Apply(self, [x, idx, gz], [x.type()])

    def perform(self, node, inputs, output_storage):
        import scipy.sparse as sp

        x, idx, gz = inputs
        gz = gz.tocoo()
        rows = np.asarray(idx)[gz.row]
        out = sp.coo_matrix((gz.data, (rows, gz.col)), shape=x.shape)
        output_storage[0][0] = out.asformat(node.outputs[0].type.format)


class GetItem2Lists(Op):
    """Elementwise (rows[k], cols[k]) lookup -> dense vector."""

    __props__ = ()

    def make_node(self, x, rows, cols):
        x = _as_sparse_variable(x)
        rows = as_tensor_variable(rows)
        cols = as_tensor_variable(cols)
        out = TensorType(x.type.dtype, (rows.type.shape[0],))()
        return Apply(self, [x, rows, cols], [out])

    def perform(self, node, inputs, output_storage):
        x, rows, cols = inputs
        output_storage[0][0] = np.asarray(
            x[np.asarray(rows), np.asarray(cols)],
            dtype=node.outputs[0].type.numpy_dtype).ravel()

    def infer_shape(self, fgraph, node, input_shapes):
        return [input_shapes[1]]

    def L_op(self, inputs, outputs, output_grads):
        from pytensor_tpu.gradient import grad_undefined

        x, rows, cols = inputs
        (gz,) = output_grads
        return [GetItem2ListsGrad()(x, rows, cols, gz),
                grad_undefined(self, 1, rows, "integer index"),
                grad_undefined(self, 2, cols, "integer index")]


get_item_2lists = GetItem2Lists()


class GetItem2ListsGrad(Op):
    """Sparse matrix with gz[k] at (rows[k], cols[k]) (x's shape)."""

    __props__ = ()

    def make_node(self, x, rows, cols, gz):
        x = _as_sparse_variable(x)
        rows = as_tensor_variable(rows)
        cols = as_tensor_variable(cols)
        gz = as_tensor_variable(gz)
        return Apply(self, [x, rows, cols, gz], [x.type()])

    def perform(self, node, inputs, output_storage):
        import scipy.sparse as sp

        x, rows, cols, gz = inputs
        out = sp.coo_matrix(
            (np.asarray(gz), (np.asarray(rows), np.asarray(cols))),
            shape=x.shape)
        output_storage[0][0] = out.asformat(node.outputs[0].type.format)


class Diag(Op):
    """Main diagonal of a square sparse matrix -> dense vector."""

    __props__ = ()

    def make_node(self, x):
        x = _as_sparse_variable(x)
        n = x.type.shape[0]
        return Apply(self, [x], [TensorType(x.type.dtype, (n,))()])

    def perform(self, node, inputs, output_storage):
        (x,) = inputs
        output_storage[0][0] = np.asarray(
            x.diagonal(), dtype=node.outputs[0].type.numpy_dtype)

    def infer_shape(self, fgraph, node, input_shapes):
        return [(input_shapes[0][0],)]

    def L_op(self, inputs, outputs, output_grads):
        from pytensor_tpu.sparse.compat import square_diagonal

        (gz,) = output_grads
        return [square_diagonal(gz)]


diag = Diag()


class ConstructSparseFromList(Op):
    """Sparse matrix (x's shape) whose rows at ``ilist`` are the rows of
    dense ``values`` (repeats accumulate) — the gradient carrier for
    advanced indexing into sparse matrices (reference
    ConstructSparseFromList)."""

    __props__ = ()

    def make_node(self, x, values, ilist):
        from pytensor_tpu.graph.basic import Variable

        if isinstance(x, Variable) and isinstance(x.type, SparseTensorType):
            xt = x
            fmt = x.type.format
        else:
            xt = as_tensor_variable(x)
            fmt = "csr"
        values = as_tensor_variable(values)
        ilist = as_tensor_variable(ilist)
        out = SparseTensorType(fmt, values.type.dtype,
                               (xt.type.shape[0], xt.type.shape[1]))()
        return Apply(self, [xt, values, ilist], [out])

    def perform(self, node, inputs, output_storage):
        import scipy.sparse as sp

        x, values, ilist = inputs
        m, c = values.shape
        rows = np.repeat(np.asarray(ilist), c)
        cols = np.tile(np.arange(c), m)
        out = sp.coo_matrix((values.ravel(), (rows, cols)), shape=x.shape)
        output_storage[0][0] = out.asformat(node.outputs[0].type.format)


construct_sparse_from_list = ConstructSparseFromList()


def _register_xla():
    import jax
    import jax.numpy as jnp
    from jax.experimental import sparse as jsp

    from pytensor_tpu.link.xla.dispatch import xla_funcify
    from pytensor_tpu.sparse.basic import _to_bcoo

    def _selection_matrix(idx, n, dtype):
        m = idx.shape[0]
        ind = jnp.stack([jnp.arange(m, dtype="int32"),
                         jnp.asarray(idx, dtype="int32")], axis=1)
        return jsp.BCOO((jnp.ones(m, dtype), ind), shape=(m, n),
                        unique_indices=False)

    @xla_funcify.register(GetItemList)
    def _gil(op, node=None, **kw):
        def gil(x, idx):
            xb = _to_bcoo(x)
            S = _selection_matrix(idx, xb.shape[0], xb.data.dtype)
            return S @ xb  # bcoo_spdot: exact with repeats, static nse

        return gil

    @xla_funcify.register(GetItemListGrad)
    def _gilg(op, node=None, **kw):
        def gilg(x, idx, gz):
            gb = _to_bcoo(gz)
            S = _selection_matrix(idx, _to_bcoo(x).shape[0], gb.data.dtype)
            return S.T @ gb

        return gilg

    @xla_funcify.register(GetItem2Lists)
    def _gi2(op, node=None, **kw):
        def gi2(x, rows, cols):
            xb = _to_bcoo(x)
            r = xb.indices[:, 0]
            c = xb.indices[:, 1]
            # (q, nnz) one-hot mask contraction: MXU-friendly, no scatter
            mask = ((r[None, :] == jnp.asarray(rows)[:, None])
                    & (c[None, :] == jnp.asarray(cols)[:, None]))
            return mask.astype(xb.data.dtype) @ xb.data

        return gi2

    @xla_funcify.register(GetItem2ListsGrad)
    def _gi2g(op, node=None, **kw):
        def gi2g(x, rows, cols, gz):
            xb = _to_bcoo(x)
            ind = jnp.stack([jnp.asarray(rows, dtype="int32"),
                             jnp.asarray(cols, dtype="int32")], axis=1)
            return jsp.BCOO((jnp.asarray(gz), ind), shape=xb.shape)

        return gi2g

    @xla_funcify.register(Diag)
    def _diag(op, node=None, **kw):
        def diag_fn(x):
            xb = _to_bcoo(x)
            r = xb.indices[:, 0]
            c = xb.indices[:, 1]
            vals = jnp.where(r == c, xb.data, jnp.zeros_like(xb.data))
            return jax.ops.segment_sum(
                vals, r, num_segments=xb.shape[0],
                indices_are_sorted=bool(getattr(xb, "indices_sorted", False)))

        return diag_fn

    @xla_funcify.register(ConstructSparseFromList)
    def _csfl(op, node=None, **kw):
        def csfl(x, values, ilist):
            xb = _to_bcoo(x)
            m, ccount = values.shape
            rows = jnp.repeat(jnp.asarray(ilist, dtype="int32"), ccount)
            cols = jnp.tile(jnp.arange(ccount, dtype="int32"), m)
            ind = jnp.stack([rows, cols], axis=1)
            return jsp.BCOO((values.ravel(), ind), shape=xb.shape)

        return csfl


_register_xla()
