"""Sparse tensor type.

Parallels /root/reference/pytensor/sparse/ (SparseTensorType:36 over
scipy.sparse csr/csc).  TPU-first: the oracle value space is scipy.sparse
(csr/csc); on the XLA path values convert to jax.experimental.sparse BCOO
(the TPU-supported sparse format) at the function boundary.
"""

from __future__ import annotations

import numpy as np

from pytensor_tpu.graph.type import HasDataType, HasShape, Type


class SparseTensorType(Type, HasDataType, HasShape):
    __props__ = ("format", "dtype", "shape")

    def __init__(self, format: str, dtype: str, shape=None):
        if format not in ("csr", "csc", "bcoo", "bsr"):
            raise ValueError(f"unsupported sparse format {format}")
        self.format = format
        self.dtype = str(dtype)
        self.shape = tuple(shape) if shape is not None else (None, None)

    @property
    def ndim(self):
        return len(self.shape)

    @property
    def numpy_dtype(self):
        return np.dtype(self.dtype)

    def filter(self, value, strict=False, allow_downcast=None):
        import scipy.sparse as sp

        if sp.issparse(value):
            if value.format != self.format and self.format in ("csr", "csc", "bsr"):
                value = value.asformat(self.format)
            if str(value.dtype) != self.dtype:
                if strict:
                    raise TypeError(f"expected dtype {self.dtype}, got {value.dtype}")
                value = value.astype(self.dtype)
            return value
        try:
            from jax.experimental import sparse as jsparse

            if isinstance(value, jsparse.BCOO):
                return value
        except ImportError:
            pass
        if strict:
            raise TypeError(f"expected a sparse matrix, got {type(value)}")
        import scipy.sparse as sp2

        arr = np.asarray(value, dtype=self.numpy_dtype)
        fmt = self.format if self.format not in ('bcoo',) else 'csr'
        return getattr(sp2, f"{fmt}_matrix")(arr)

    def xla_typify(self, value):
        """Convert an oracle value (scipy.sparse) into a BCOO for jit."""
        from jax.experimental import sparse as jsparse

        if isinstance(value, jsparse.BCOO):
            return value
        if hasattr(value, "sort_indices"):
            value = value.copy()
            if not getattr(value, "has_canonical_format", False):
                # csr/csc can legally carry duplicate (row, col) entries;
                # sort_indices() does NOT merge them, and promising
                # unique_indices=True to XLA over duplicates is UB
                value.sum_duplicates()
            value.sort_indices()
        coo = value.tocoo()
        import jax.numpy as jnp

        indices = jnp.stack(
            [jnp.asarray(coo.row, dtype="int32"), jnp.asarray(coo.col, dtype="int32")],
            axis=1,
        )
        # csr.tocoo with sorted indices is lexicographic (row, col): mark it
        # so lowerings can use the fast sorted segment/gather paths
        return jsparse.BCOO((jnp.asarray(coo.data), indices), shape=coo.shape,
                            indices_sorted=value.format == "csr",
                            unique_indices=True)

    def values_eq(self, a, b):
        return (a != b).nnz == 0 if hasattr(a, "nnz") else bool(np.array_equal(a, b))

    def values_eq_approx(self, a, b, **kwargs):
        da = a.toarray() if hasattr(a, "toarray") else np.asarray(a)
        db = b.toarray() if hasattr(b, "toarray") else np.asarray(b)
        return np.allclose(da, db)

    def make_constant_signature(self, data):
        return (self.format, self.dtype, data.shape, data.tobytes()
                if isinstance(data, np.ndarray) else id(data))

    def __str__(self):
        return f"Sparse({self.format}, {self.dtype}, {self.shape})"


def matrix(format="csr", name=None, dtype=None):
    from pytensor_tpu.config import config

    return SparseTensorType(format, dtype or config.floatX)(name)


csr_matrix = lambda name=None, dtype=None: matrix("csr", name, dtype)  # noqa: E731
csc_matrix = lambda name=None, dtype=None: matrix("csc", name, dtype)  # noqa: E731
bsr_matrix = lambda name=None, dtype=None: matrix("bsr", name, dtype)  # noqa: E731
csr_dmatrix = lambda name=None: matrix("csr", name, "float64")  # noqa: E731
csc_dmatrix = lambda name=None: matrix("csc", name, "float64")  # noqa: E731
bsr_dmatrix = lambda name=None: matrix("bsr", name, "float64")  # noqa: E731
csr_fmatrix = lambda name=None: matrix("csr", name, "float32")  # noqa: E731
csc_fmatrix = lambda name=None: matrix("csc", name, "float32")  # noqa: E731
bsr_fmatrix = lambda name=None: matrix("bsr", name, "float32")  # noqa: E731


def _wire_variable_classes():
    # sugar classes live in sparse/variable.py (reference sparse/variable.py)
    from pytensor_tpu.sparse.variable import SparseConstant, SparseVariable

    SparseTensorType.variable_type = SparseVariable
    SparseTensorType.constant_type = SparseConstant


_wire_variable_classes()
