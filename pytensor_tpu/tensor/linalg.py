"""Linear algebra ops: decompositions, solvers, misc.

Parallels /root/reference/pytensor/tensor/linalg/ (decomposition/
cholesky.py:18, lu.py, qr.py, svd.py, eigen.py; solvers/core.py:126,
triangular.py, psd.py:14; inverse.py, summary.py, products.py).
TPU-first: every op lowers to jnp.linalg / jax.scipy.linalg (XLA custom
calls on device), is Blockwise-batchable via a gufunc signature, and
carries the standard matrix-calculus gradients.
"""

from __future__ import annotations

import numpy as np

from pytensor_tpu.graph.basic import Apply
from pytensor_tpu.graph.null_type import DisconnectedType
from pytensor_tpu.graph.op import Op
from pytensor_tpu.scalar.basic import upcast, upcast_float
from pytensor_tpu.tensor import math as tm
from pytensor_tpu.tensor.basic import (
    as_tensor_variable,
    cast,
    diag,
    diagonal,
    eye,
    identity_like,
    tril,
    triu,
    zeros_like,
)
from pytensor_tpu.tensor.blockwise import Blockwise
from pytensor_tpu.tensor.elemwise import DimShuffle
from pytensor_tpu.tensor.math import Dot, dot, matmul, outer, sum as pt_sum
from pytensor_tpu.tensor.type import TensorType


def _mT(x):
    from pytensor_tpu.tensor.basic import matrix_transpose

    return matrix_transpose(x) if x.type.ndim >= 2 else x


def _core2(op, *inputs, out_ndims=None):
    """Apply a core linalg op, Blockwise-wrapping when batched."""
    inputs = [as_tensor_variable(i) for i in inputs]
    core_ndims = op.core_in_ndims
    if any(i.type.ndim > c for i, c in zip(inputs, core_ndims)):
        return Blockwise(op, signature=op.gufunc_signature)(*inputs)
    return op(*inputs)


class MatrixOp(Op):
    """Base for square-matrix core ops."""

    core_in_ndims = (2,)

    def _check_matrix(self, x):
        x = as_tensor_variable(x)
        if x.type.ndim != 2:
            raise TypeError(f"{self} expects a matrix, got ndim={x.type.ndim}")
        return x

    def _float_type(self, x, square=True):
        dtype = upcast_float(x.type.dtype)
        n, m = x.type.shape
        return TensorType(dtype, (n, m))


class Cholesky(MatrixOp):
    """Lower/upper Cholesky factor (reference decomposition/cholesky.py:18)."""

    __props__ = ("lower", "on_error", "check_finite")
    gufunc_signature = "(n,n)->(n,n)"

    def __init__(self, lower=True, on_error="raise", check_finite=False):
        self.lower = bool(lower)
        self.on_error = on_error
        # honored by the oracle path; the jitted XLA path skips it (same
        # convention as jax.scipy.linalg, where the flag is a no-op on
        # device — a data-dependent raise cannot live in an executable)
        self.check_finite = bool(check_finite)

    def make_node(self, x):
        x = self._check_matrix(x)
        return Apply(self, [x], [self._float_type(x)()])

    def perform(self, node, inputs, output_storage):
        (x,) = inputs
        if self.check_finite and not np.all(np.isfinite(x)):
            raise ValueError("array must not contain infs or NaNs")
        try:
            L = np.linalg.cholesky(np.asarray(x, dtype=node.outputs[0].type.numpy_dtype))
            if not self.lower:
                L = L.T.conj()
        except np.linalg.LinAlgError:
            if self.on_error == "raise":
                raise
            L = np.full_like(np.asarray(x), np.nan)
        output_storage[0][0] = L.astype(node.outputs[0].type.numpy_dtype)

    def infer_shape(self, fgraph, node, input_shapes):
        return [input_shapes[0]]

    def L_op(self, inputs, outputs, output_grads):
        # Cholesky pullback (Murray 2016): with L lower and only tril(A)
        # read by the factorization,
        #   G = L^-T phi*(L^T Lbar) L^-1,  phi*(M) = tril(M) - diag(M)/2
        #   Abar = tril(G + G^T) - diag(G)
        # Both masking steps are CONSTANT elementwise masks (tri/eye), not
        # diag-scatters: a diag(diagonal(M)) graph lowers to scatter+pad
        # HLO that breaks fusion (measured 6% on the batched-chol bench).
        (x,) = inputs
        (L,) = outputs
        (Lbar,) = output_grads
        if not self.lower:
            # U = L^T: reduce to the lower case
            L = _mT(L)
            Lbar = _mT(Lbar)
        from pytensor_tpu.tensor.basic import eye as _eye, tri as _tri

        n = L.type.shape[-1]
        if n is None:
            from pytensor_tpu.tensor.shape import shape as _shape

            n = _shape(L)[-1]
        dt = L.type.dtype
        I = _eye(n, n, 0, dtype=dt)
        M = matmul(_mT(L), Lbar)
        # tril(M) - diag(M)/2  ==  M * (tril_ones - I/2)
        phi = M * (_tri(n, n, 0, dtype=dt) - 0.5 * I)
        solve_ut = SolveTriangular(lower=False)
        X1 = _core2(solve_ut, _mT(L), phi)          # L^-T phi
        G = _mT(_core2(solve_ut, _mT(L), _mT(X1)))  # X1 L^-1
        return [_sym_tril_grad(G)]

    def __str__(self):
        return f"Cholesky{{lower={self.lower}}}"


def _sym_tril_grad(G):
    """Gradient wrt A when only tril(A) is read as a symmetric matrix.

    tril(G + G^T) - diag(diagonal(G)) as CONSTANT elementwise masks
    ((G+G^T) * strict_tril + G * I) — diag-of-diagonal lowers to
    scatter+pad HLO that breaks XLA fusion."""
    from pytensor_tpu.tensor.basic import eye as _eye, tri as _tri
    from pytensor_tpu.tensor.shape import shape as _shape

    n = G.type.shape[-1]
    if n is None:
        n = _shape(G)[-1]
    dt = G.type.dtype
    return (G + _mT(G)) * _tri(n, n, -1, dtype=dt) + G * _eye(n, n, 0, dtype=dt)


def cholesky(x, lower=True, on_error="raise", check_finite=False):
    return _core2(
        Cholesky(lower=lower, on_error=on_error, check_finite=check_finite), x
    )


class SolveBase(MatrixOp):
    core_in_ndims = (2, None)  # b ndim set per call

    def __init__(self, b_ndim=2, **kwargs):
        self.b_ndim = int(b_ndim)

    @property
    def gufunc_signature(self):
        if self.b_ndim == 1:
            return "(n,n),(n)->(n)"
        return "(n,n),(n,m)->(n,m)"

    @property
    def core_in_ndims(self):
        return (2, self.b_ndim)

    def make_node(self, a, b):
        a = self._check_matrix(a)
        b = as_tensor_variable(b)
        if b.type.ndim != self.b_ndim:
            raise TypeError(f"b must have ndim={self.b_ndim}")
        dtype = upcast_float(a.type.dtype, b.type.dtype)
        out = TensorType(dtype, b.type.shape)()
        return Apply(self, [a, b], [out])

    def infer_shape(self, fgraph, node, input_shapes):
        return [input_shapes[1]]

    def _solve_mat(self, a, b):
        raise NotImplementedError

    def perform(self, node, inputs, output_storage):
        a, b = inputs
        dt = node.outputs[0].type.numpy_dtype
        output_storage[0][0] = np.asarray(self._solve_mat(a, b), dtype=dt)

    def _transpose_op(self):
        """Op solving with A^T (for the gradient)."""
        raise NotImplementedError

    def L_op(self, inputs, outputs, output_grads):
        a, b = inputs
        (c,) = outputs
        (cbar,) = output_grads
        bbar = self._transpose_op()(_mT(a) if self.transpose_uses_a_T else a, cbar)
        if self.b_ndim == 1:
            abar = -outer(bbar, c)
        else:
            abar = -matmul(bbar, _mT(c))
        abar = self._restrict_abar(abar)
        return [abar, bbar]

    transpose_uses_a_T = True

    def _restrict_abar(self, abar):
        return abar


class Solve(SolveBase):
    __props__ = ("b_ndim", "assume_a")

    def __init__(self, b_ndim=2, assume_a="gen", **kwargs):
        super().__init__(b_ndim)
        self.assume_a = assume_a

    def _solve_mat(self, a, b):
        import scipy.linalg as sla

        return sla.solve(a, b, assume_a=self.assume_a)

    def _transpose_op(self):
        return Solve(b_ndim=self.b_ndim, assume_a=self.assume_a)


class SolveTriangular(SolveBase):
    __props__ = ("b_ndim", "lower", "unit_diagonal", "trans")

    def __init__(self, b_ndim=2, lower=True, unit_diagonal=False, trans=0, **kwargs):
        super().__init__(b_ndim)
        self.lower = bool(lower)
        self.unit_diagonal = bool(unit_diagonal)
        self.trans = trans

    def _solve_mat(self, a, b):
        import scipy.linalg as sla

        return sla.solve_triangular(a, b, lower=self.lower, trans=self.trans,
                                    unit_diagonal=self.unit_diagonal)

    def _transpose_op(self):
        # solving with A^T flips triangularity only if we pass A^T explicitly
        return SolveTriangular(b_ndim=self.b_ndim, lower=not self.lower,
                               unit_diagonal=self.unit_diagonal)

    def _restrict_abar(self, abar):
        return tril(abar) if self.lower else triu(abar)


class CholeskySolve(SolveBase):
    """Solve A x = b given the Cholesky factor of A (reference psd.py:14)."""

    __props__ = ("b_ndim", "lower")

    def __init__(self, b_ndim=2, lower=True, **kwargs):
        super().__init__(b_ndim)
        self.lower = bool(lower)

    def _solve_mat(self, c, b):
        import scipy.linalg as sla

        return sla.cho_solve((c, self.lower), b)

    def L_op(self, inputs, outputs, output_grads):
        from pytensor_tpu.gradient import grad_not_implemented

        c, b = inputs
        (x,) = outputs
        (xbar,) = output_grads
        bbar = CholeskySolve(b_ndim=self.b_ndim, lower=self.lower)(c, xbar)
        if self.b_ndim == 1:
            cbar_full = -outer(bbar, x)
        else:
            cbar_full = -matmul(bbar, _mT(x))
        # d/dc of cho_solve: route through A = c c^T
        cbar = matmul(cbar_full + _mT(cbar_full), c)
        cbar = tril(cbar) if self.lower else triu(cbar)
        return [cbar, bbar]


def solve(a, b, assume_a="gen", lower=True, b_ndim=None, **kwargs):
    a = as_tensor_variable(a)
    b = as_tensor_variable(b)
    if b_ndim is None:
        b_ndim = min(b.type.ndim, 2) if b.type.ndim else 1
    if assume_a in ("sym", "her", "pos") and kwargs.get("use_cholesky"):
        pass
    return _core2(Solve(b_ndim=b_ndim, assume_a=assume_a), a, b)


def solve_triangular(a, b, lower=True, trans=0, unit_diagonal=False, b_ndim=None,
                     **kwargs):
    a = as_tensor_variable(a)
    b = as_tensor_variable(b)
    if trans in (1, "T", True):
        a = _mT(a)
        lower = not lower
    if b_ndim is None:
        b_ndim = min(b.type.ndim, 2) if b.type.ndim else 1
    return _core2(SolveTriangular(b_ndim=b_ndim, lower=lower,
                                  unit_diagonal=unit_diagonal), a, b)


def cho_solve(c_and_lower, b, b_ndim=None, **kwargs):
    c, lower = c_and_lower if isinstance(c_and_lower, tuple) else (c_and_lower, True)
    c = as_tensor_variable(c)
    b = as_tensor_variable(b)
    if b_ndim is None:
        b_ndim = min(b.type.ndim, 2) if b.type.ndim else 1
    return _core2(CholeskySolve(b_ndim=b_ndim, lower=lower), c, b)


class MatrixInverse(MatrixOp):
    __props__ = ()
    gufunc_signature = "(n,n)->(n,n)"

    def make_node(self, x):
        x = self._check_matrix(x)
        return Apply(self, [x], [self._float_type(x)()])

    def perform(self, node, inputs, output_storage):
        output_storage[0][0] = np.linalg.inv(inputs[0]).astype(
            node.outputs[0].type.numpy_dtype
        )

    def infer_shape(self, fgraph, node, input_shapes):
        return [input_shapes[0]]

    def L_op(self, inputs, outputs, output_grads):
        (xi,) = outputs
        (gz,) = output_grads
        return [-matmul(matmul(_mT(xi), gz), _mT(xi))]

    def R_op(self, inputs, eval_points):
        (xi,) = [self(inputs[0])]
        (ev,) = eval_points
        if ev is None:
            return [None]
        return [-matmul(matmul(xi, ev), xi)]


matrix_inverse_op = MatrixInverse()


def inv(x):
    return _core2(matrix_inverse_op, x)


matrix_inverse = inv


def pinv(x, hermitian=False, rcond=None):
    """Moore-Penrose pseudoinverse (np.linalg.pinv semantics, incl.
    rank-deficient inputs): SVD-based with numpy's singular-value
    cutoff; hermitian=True uses the cheaper eigendecomposition.
    Reference MatrixPinv (nlinalg.py) wraps np.linalg.pinv; this is the
    same algorithm composed in-graph (differentiable end to end)."""
    from pytensor_tpu.tensor.math import maximum
    from pytensor_tpu.tensor.shape import shape

    x = as_tensor_variable(x)
    if rcond is None:
        eps = np.finfo(np.dtype(upcast_float(x.type.dtype))).eps
        m = shape(x)[-2]
        n = shape(x)[-1]
        rcond_v = cast(maximum(m, n), upcast_float(x.type.dtype)) * eps
    else:
        rcond_v = as_tensor_variable(rcond)
    if hermitian:
        w, v = eigh(x)
        cutoff = rcond_v * tm.max(tm.abs(w))
        keep = tm.abs(w) > cutoff
        w_inv = tm.switch(keep, 1.0 / w, zeros_like(w))
        return matmul(v * w_inv[..., None, :], _mT(v))
    u, s, vt = svd(x, full_matrices=False)
    cutoff = rcond_v * tm.max(s)
    keep = s > cutoff
    s_inv = tm.switch(keep, 1.0 / s, zeros_like(s))
    return matmul(_mT(vt) * s_inv[..., None, :], _mT(u))


class Det(MatrixOp):
    __props__ = ()
    gufunc_signature = "(n,n)->()"

    def make_node(self, x):
        x = self._check_matrix(x)
        dtype = upcast_float(x.type.dtype)
        return Apply(self, [x], [TensorType(dtype, ())()])

    def perform(self, node, inputs, output_storage):
        output_storage[0][0] = np.asarray(
            np.linalg.det(inputs[0]), dtype=node.outputs[0].type.numpy_dtype
        )

    def infer_shape(self, fgraph, node, input_shapes):
        return [()]

    def L_op(self, inputs, outputs, output_grads):
        (x,) = inputs
        (d,) = outputs
        (gz,) = output_grads
        return [gz * d * _mT(inv(x))]


det_op = Det()


def det(x):
    return _core2(det_op, x)


class SLogDet(MatrixOp):
    __props__ = ()
    gufunc_signature = "(n,n)->(),()"

    def make_node(self, x):
        x = self._check_matrix(x)
        dtype = upcast_float(x.type.dtype)
        return Apply(self, [x], [TensorType(dtype, ())(), TensorType(dtype, ())()])

    def perform(self, node, inputs, output_storage):
        sign, logdet = np.linalg.slogdet(inputs[0])
        dt = node.outputs[0].type.numpy_dtype
        output_storage[0][0] = np.asarray(sign, dtype=dt)
        output_storage[1][0] = np.asarray(logdet, dtype=dt)

    def infer_shape(self, fgraph, node, input_shapes):
        return [(), ()]

    def L_op(self, inputs, outputs, output_grads):
        (x,) = inputs
        sign, logdet = outputs
        gsign, glogdet = output_grads
        return [glogdet * _mT(inv(x))]


slogdet_op = SLogDet()


def slogdet(x):
    return _core2(slogdet_op, x)


def logdet(x):
    return slogdet(x)[1]


class Eigh(MatrixOp):
    __props__ = ("UPLO",)
    gufunc_signature = "(n,n)->(n),(n,n)"

    def __init__(self, UPLO="L"):
        self.UPLO = UPLO

    def make_node(self, x):
        x = self._check_matrix(x)
        dtype = upcast_float(x.type.dtype)
        n = x.type.shape[0] or x.type.shape[1]
        w = TensorType(dtype, (n,))()
        v = TensorType(dtype, (n, n))()
        return Apply(self, [x], [w, v])

    def perform(self, node, inputs, output_storage):
        w, v = np.linalg.eigh(inputs[0], self.UPLO)
        dt = node.outputs[0].type.numpy_dtype
        output_storage[0][0] = w.astype(dt)
        output_storage[1][0] = v.astype(dt)

    def infer_shape(self, fgraph, node, input_shapes):
        (xshp,) = input_shapes
        return [(xshp[0],), tuple(xshp)]

    def L_op(self, inputs, outputs, output_grads):
        # standard eigh pullback with degenerate-safe F matrix
        from pytensor_tpu.graph.null_type import DisconnectedType as _D

        (x,) = inputs
        w, v = outputs
        wbar, vbar = output_grads
        W = w.dimshuffle("x", 0) - w.dimshuffle(0, "x")
        F = tm.switch(tm.eq(W, 0.0), zeros_like(W),
                      1.0 / tm.switch(tm.eq(W, 0.0), zeros_like(W) + 1.0, W))
        vtvbar = matmul(_mT(v), vbar)
        # diag(wbar) as an elementwise mask (I * wbar-row), not a scatter
        from pytensor_tpu.tensor.basic import eye as _eye

        n_ = w.type.shape[0]
        if n_ is None:
            from pytensor_tpu.tensor.shape import shape as _shape

            n_ = _shape(w)[0]
        inner = _eye(n_, n_, 0, dtype=w.type.dtype) * wbar.dimshuffle("x", 0) \
            + F * vtvbar
        G = matmul(matmul(v, inner), _mT(v))
        # eigh reads only one triangle of A (UPLO); map back accordingly
        if self.UPLO == "L":
            return [_sym_tril_grad(G)]
        return [_mT(_sym_tril_grad(_mT(G)))]


def eigh(x, UPLO="L"):
    return _core2(Eigh(UPLO), x)


class Eig(MatrixOp):
    __props__ = ()
    gufunc_signature = "(n,n)->(n),(n,n)"

    def make_node(self, x):
        x = self._check_matrix(x)
        n = x.type.shape[0] or x.type.shape[1]
        dtype = "complex128" if x.type.dtype == "float64" else "complex64"
        return Apply(self, [x], [TensorType(dtype, (n,))(),
                                 TensorType(dtype, (n, n))()])

    def perform(self, node, inputs, output_storage):
        w, v = np.linalg.eig(inputs[0])
        dt = node.outputs[0].type.numpy_dtype
        output_storage[0][0] = w.astype(dt)
        output_storage[1][0] = v.astype(dt)


def eig(x):
    return Eig()(x)


class QR(MatrixOp):
    __props__ = ("mode",)

    def __init__(self, mode="reduced"):
        self.mode = mode

    @property
    def gufunc_signature(self):
        if self.mode == "reduced":
            return "(m,n)->(m,k),(k,n)"
        if self.mode == "r":
            return "(m,n)->(k,n)"
        return "(m,n)->(m,m),(m,n)"

    def make_node(self, x):
        x = self._check_matrix(x)
        dtype = upcast_float(x.type.dtype)
        m, n = x.type.shape
        k = None if (m is None or n is None) else min(m, n)
        if self.mode == "r":
            outs = [TensorType(dtype, (k, n))()]
        elif self.mode == "reduced":
            outs = [TensorType(dtype, (m, k))(), TensorType(dtype, (k, n))()]
        else:
            outs = [TensorType(dtype, (m, m))(), TensorType(dtype, (m, n))()]
        return Apply(self, [x], outs)

    def perform(self, node, inputs, output_storage):
        res = np.linalg.qr(inputs[0], mode=self.mode)
        if not isinstance(res, tuple):
            res = (res,)
        dt = node.outputs[0].type.numpy_dtype
        for s, r in zip(output_storage, res):
            s[0] = np.asarray(r, dtype=dt)

    def L_op(self, inputs, outputs, output_grads):
        # QR pullback (Townsend 2016; Liao et al. 2019 for m < n), covering
        # modes reduced / r / complete — the same coverage as the reference
        # decomposition/qr.py:230-319 (mode=raw and complete-with-m>n have
        # no defined gradient there either)
        from pytensor_tpu.gradient import DisconnectedType, grad_not_implemented
        from pytensor_tpu.graph.null_type import NullType
        from pytensor_tpu.tensor.basic import concatenate, zeros_like

        if self.mode == "raw":
            return [grad_not_implemented(self, 0, inputs[0], "qr mode=raw")]
        (x,) = inputs
        m_s, n_s = x.type.shape
        if self.mode == "r":
            # recompute the reduced factorization: the R-pullback needs Q
            q, r = _core2(QR(mode="reduced"), x)
            (rbar,) = output_grads
            qbar = zeros_like(q)
        else:
            q, r = outputs
            qbar, rbar = output_grads
            if isinstance(getattr(qbar, "type", None), (DisconnectedType, NullType)):
                qbar = zeros_like(q)
            if isinstance(getattr(rbar, "type", None), (DisconnectedType, NullType)):
                rbar = zeros_like(r)
        if m_s is None or n_s is None:
            return [grad_not_implemented(
                self, 0, x, "qr gradient needs static (m, n) to pick the "
                "m>=n / m<n formula (TPU graphs are static-shape)")]

        def copyltu(M):
            # tril(M,-1) + tril(M,-1)^T + diag(diagonal(M)) as constant
            # elementwise masks (diag-of-diagonal lowers to scatter+pad)
            from pytensor_tpu.tensor.basic import eye as _eye, tri as _tri

            n_ = M.type.shape[-1]
            if n_ is None:
                from pytensor_tpu.tensor.shape import shape as _shape

                n_ = _shape(M)[-1]
            dt = M.type.dtype
            low = M * _tri(n_, n_, -1, dtype=dt)
            return low + _mT(low) + M * _eye(n_, n_, 0, dtype=dt)

        solve_ut = SolveTriangular(lower=False)
        if self.mode == "complete" and m_s > n_s:
            return [grad_not_implemented(
                self, 0, x, "qr mode=complete with m > n: the extra Q "
                "columns are gauge freedom (reference raises too)")]
        if m_s >= n_s:
            M = matmul(r, _mT(rbar)) - matmul(_mT(qbar), q)
            K = qbar + matmul(q, copyltu(M))
            xbar = _mT(_core2(solve_ut, _conj_r(r), _mT(K)))
            return [xbar]
        # m < n (wide): split A = [X | Y] with X (m, m)
        Y = x[:, m_s:]
        U = r[:, :m_s]
        dU = rbar[:, :m_s]
        dV = rbar[:, m_s:]
        dQ2 = qbar + matmul(Y, _mT(dV))
        M = matmul(U, _mT(dU)) - matmul(_mT(dQ2), q)
        Xbar = _mT(_core2(solve_ut, _conj_r(U),
                          _mT(dQ2 + matmul(q, copyltu(M)))))
        Ybar = matmul(q, dV)
        return [concatenate([Xbar, Ybar], axis=1)]


def _conj_r(r):
    return r


def qr(x, mode="reduced"):
    out_ndims = (2,) if mode == "r" else (2, 2)
    return _core2(QR(mode), x, out_ndims=out_ndims)


class SVD(MatrixOp):
    __props__ = ("full_matrices", "compute_uv")

    def __init__(self, full_matrices=True, compute_uv=True):
        self.full_matrices = bool(full_matrices)
        self.compute_uv = bool(compute_uv)

    @property
    def gufunc_signature(self):
        if not self.compute_uv:
            return "(m,n)->(k)"
        if self.full_matrices:
            return "(m,n)->(m,m),(k),(n,n)"
        return "(m,n)->(m,k),(k),(k,n)"

    def make_node(self, x):
        x = self._check_matrix(x)
        dtype = upcast_float(x.type.dtype)
        m, n = x.type.shape
        k = None if (m is None or n is None) else min(m, n)
        s = TensorType(dtype, (k,))()
        if not self.compute_uv:
            return Apply(self, [x], [s])
        if self.full_matrices:
            u = TensorType(dtype, (m, m))()
            vt = TensorType(dtype, (n, n))()
        else:
            u = TensorType(dtype, (m, k))()
            vt = TensorType(dtype, (k, n))()
        return Apply(self, [x], [u, s, vt])

    def perform(self, node, inputs, output_storage):
        dt = node.outputs[0].type.numpy_dtype
        if self.compute_uv:
            u, s, vt = np.linalg.svd(inputs[0], full_matrices=self.full_matrices)
            output_storage[0][0] = u.astype(dt)
            output_storage[1][0] = s.astype(dt)
            output_storage[2][0] = vt.astype(dt)
        else:
            s = np.linalg.svd(inputs[0], compute_uv=False)
            output_storage[0][0] = s.astype(dt)

    def L_op(self, inputs, outputs, output_grads):
        from pytensor_tpu.gradient import grad_not_implemented

        (x,) = inputs
        if not self.compute_uv:
            (s,) = outputs
            (sbar,) = output_grads
            # d s_k = u_k^T dX v_k: xbar = U diag(sbar) V^T, with the
            # diagonal factor applied as a column scale (no scatter, one
            # fewer matmul)
            u, s2, vt = SVD(full_matrices=False, compute_uv=True)(x)
            return [matmul(u * sbar.dimshuffle("x", 0), vt)]
        return [grad_not_implemented(self, 0, x, "svd grad with compute_uv")]


def svd(x, full_matrices=True, compute_uv=True):
    return _core2(SVD(full_matrices, compute_uv), x)


class Lu(MatrixOp):
    """PLU decomposition (scipy.linalg.lu with permute_l=False)."""

    __props__ = ("permute_l", "p_indices")

    @property
    def gufunc_signature(self):
        if self.permute_l:
            return "(n,n)->(n,n),(n,n)"
        return "(n,n)->(n,n),(n,n),(n,n)"

    def __init__(self, permute_l=False, p_indices=False):
        self.permute_l = bool(permute_l)
        self.p_indices = bool(p_indices)

    def make_node(self, x):
        x = self._check_matrix(x)
        dtype = upcast_float(x.type.dtype)
        n = x.type.shape[0]
        t = TensorType(dtype, (n, n))
        if self.permute_l:
            return Apply(self, [x], [t(), t()])
        return Apply(self, [x], [t(), t(), t()])

    def perform(self, node, inputs, output_storage):
        import scipy.linalg as sla

        dt = node.outputs[0].type.numpy_dtype
        res = sla.lu(inputs[0], permute_l=self.permute_l)
        for s, r in zip(output_storage, res):
            s[0] = np.asarray(r, dtype=dt)

    def L_op(self, inputs, outputs, output_grads):
        # PLU pullback (standard result, e.g. jax's lu vjp):
        #   F = tril(L^T Lbar, -1) + triu(U bar{U}^T ... ) — concretely
        #   Abar = P L^{-T} (tril(L^T Lbar, -1) + triu(Ubar U^T)) U^{-T}
        from pytensor_tpu.gradient import DisconnectedType, grad_not_implemented
        from pytensor_tpu.graph.null_type import NullType
        from pytensor_tpu.tensor.basic import zeros_like

        (x,) = inputs
        if self.permute_l:
            return [grad_not_implemented(self, 0, x, "permute_l lu grad")]
        P, L, U = outputs
        Pbar, Lbar, Ubar = output_grads
        if isinstance(getattr(Lbar, "type", None), (DisconnectedType, NullType)):
            Lbar = zeros_like(L)
        if isinstance(getattr(Ubar, "type", None), (DisconnectedType, NullType)):
            Ubar = zeros_like(U)
        F = tril(matmul(_mT(L), Lbar), -1) + triu(matmul(Ubar, _mT(U)))
        # Y = L^{-T} F: solve L^T Y = F (L^T upper, unit diagonal)
        Y = _core2(SolveTriangular(lower=False, unit_diagonal=True),
                   _mT(L), F)
        # Z = Y U^{-T} = (U^{-1} Y^T)^T: solve U W = Y^T (U upper)
        Z = _mT(_core2(SolveTriangular(lower=False), U, _mT(Y)))
        return [matmul(P, Z)]


def lu(x, permute_l=False, **kwargs):
    out_ndims = (2, 2) if permute_l else (2, 2, 2)
    return _core2(Lu(permute_l=permute_l), x, out_ndims=out_ndims)


class Expm(MatrixOp):
    __props__ = ()
    gufunc_signature = "(n,n)->(n,n)"

    def make_node(self, x):
        x = self._check_matrix(x)
        return Apply(self, [x], [self._float_type(x)()])

    def perform(self, node, inputs, output_storage):
        import scipy.linalg as sla

        output_storage[0][0] = np.asarray(
            sla.expm(inputs[0]), dtype=node.outputs[0].type.numpy_dtype
        )

    def L_op(self, inputs, outputs, output_grads):
        # Frechet-adjoint via the augmented-matrix identity:
        #   expm([[A^T, Gbar], [0, A^T]]) = [[expm(A^T), L], [0, expm(A^T)]]
        # with L = the adjoint directional derivative -> Abar
        from pytensor_tpu.tensor.basic import concatenate, zeros
        from pytensor_tpu.tensor.shape import shape

        (x,) = inputs
        (gz,) = output_grads
        n = shape(x)[0]
        z = zeros((n, n), dtype=x.type.dtype)
        top = concatenate([_mT(x), gz], axis=1)
        bot = concatenate([z, _mT(x)], axis=1)
        big = concatenate([top, bot], axis=0)
        E = Expm()(big)
        return [E[:n, n:]]


def expm(x):
    return _core2(Expm(), x)


def kron(a, b):
    """Kronecker product built from reshape/transpose (MXU-friendly)."""
    from pytensor_tpu.tensor.shape import reshape, shape

    a = as_tensor_variable(a)
    b = as_tensor_variable(b)
    if a.type.ndim != 2 or b.type.ndim != 2:
        raise TypeError("kron expects matrices")
    sa, sb = shape(a), shape(b)
    out = a.dimshuffle(0, "x", 1, "x") * b.dimshuffle("x", 0, "x", 1)
    return reshape(out, [sa[0] * sb[0], sa[1] * sb[1]], ndim=2)


def matrix_power(m, n):
    m = as_tensor_variable(m)
    n = int(n)
    if n < 0:
        m = inv(m)
        n = -n
    if n == 0:
        return identity_like(m)
    result = None
    z = m
    while n > 0:
        if n % 2:
            result = z if result is None else matmul(result, z)
        n //= 2
        if n:
            z = matmul(z, z)
    return result


def matrix_dot(*args):
    res = args[0]
    for a in args[1:]:
        res = dot(res, a)
    return res


def trace(x, offset=0, axis1=0, axis2=1):
    from pytensor_tpu.tensor.basic import trace as _trace

    return _trace(x, offset, axis1, axis2)


def norm(x, ord=None, axis=None, keepdims=False):
    """np.linalg.norm semantics: matrix norms for 2-d inputs with
    axis=None (max/min column/row sums, spectral, nuclear), vector norms
    otherwise (reference tensor/linalg/summary.py:34)."""
    x = as_tensor_variable(x)
    if axis is None and x.type.ndim == 2:
        absx = tm.abs(x)
        if ord in (None, "fro"):
            return tm.sqrt(pt_sum(tm.sqr(x)))
        if ord == 1:
            return tm.max(pt_sum(absx, axis=0))
        if ord == -1:
            return tm.min(pt_sum(absx, axis=0))
        if ord == np.inf:
            return tm.max(pt_sum(absx, axis=1))
        if ord == -np.inf:
            return tm.min(pt_sum(absx, axis=1))
        if ord == 2:
            return tm.max(svd(x, compute_uv=False))
        if ord == -2:
            return tm.min(svd(x, compute_uv=False))
        if ord == "nuc":
            return pt_sum(svd(x, compute_uv=False))
        raise ValueError(f"invalid matrix norm order {ord!r}")
    if ord is None:
        ord = 2
    return tm.norm(x, ord, axis=axis, keepdims=keepdims)


def solve_discrete_lyapunov(A, Q, method="bilinear"):
    """X - A X A^T = Q via the vectorized (kron) direct method."""
    from pytensor_tpu.tensor.shape import reshape, shape

    A = as_tensor_variable(A)
    Q = as_tensor_variable(Q)
    n = shape(A)[0]
    I = eye(n * n, n * n, 0, dtype=A.type.dtype)
    vecQ = Q.flatten()
    X = solve(I - kron(A, A), vecQ, b_ndim=1)
    return reshape(X, [n, n], ndim=2)


def solve_sylvester(A, B, Q):
    """A X + X B = Q via the Bartels-Stewart vectorized direct method."""
    from pytensor_tpu.tensor.shape import reshape, shape

    A = as_tensor_variable(A)
    B = as_tensor_variable(B)
    Q = as_tensor_variable(Q)
    n = shape(A)[0]
    m = shape(B)[0]
    In = eye(m, m, 0, dtype=A.type.dtype)
    Im = eye(n, n, 0, dtype=A.type.dtype)
    X = solve(kron(In, A) + kron(_mT(B), Im), Q.flatten(), b_ndim=1)
    return reshape(X, [n, m], ndim=2)


# --- XLA lowerings ------------------------------------------------------------

def _register_xla():
    from pytensor_tpu.link.xla.dispatch import xla_funcify

    import jax
    import jax.numpy as jnp
    import jax.scipy.linalg as jsl

    @xla_funcify.register(Cholesky)
    def _chol(op, node=None, **kw):
        def chol(x):
            # symmetrize_input=False: read tril(x) only, matching the numpy
            # oracle convention (and our L_op)
            L = jnp.linalg.cholesky(x, symmetrize_input=False)
            return L if op.lower else jnp.swapaxes(L, -1, -2)

        return chol

    @xla_funcify.register(Solve)
    def _solve(op, node=None, **kw):
        assume = op.assume_a

        def solve_f(a, b):
            if assume == "pos":
                c = jnp.linalg.cholesky(a)
                return jsl.cho_solve((c, True), b)
            return jnp.linalg.solve(a, b)

        return solve_f

    @xla_funcify.register(SolveTriangular)
    def _solve_tri(op, node=None, **kw):
        def solve_tri(a, b):
            return jsl.solve_triangular(a, b, lower=op.lower,
                                        unit_diagonal=op.unit_diagonal)

        return solve_tri

    @xla_funcify.register(CholeskySolve)
    def _cho_solve(op, node=None, **kw):
        def cho_solve_f(c, b):
            return jsl.cho_solve((c, op.lower), b)

        return cho_solve_f

    @xla_funcify.register(MatrixInverse)
    def _inv(op, node=None, **kw):
        return lambda x: jnp.linalg.inv(x)

    @xla_funcify.register(Det)
    def _det(op, node=None, **kw):
        return lambda x: jnp.linalg.det(x)

    @xla_funcify.register(SLogDet)
    def _slogdet(op, node=None, **kw):
        def slogdet_f(x):
            sign, logdet = jnp.linalg.slogdet(x)
            return sign, logdet

        return slogdet_f

    @xla_funcify.register(Eigh)
    def _eigh(op, node=None, **kw):
        def eigh_f(x):
            w, v = jnp.linalg.eigh(x, UPLO=op.UPLO, symmetrize_input=False)
            return w, v

        return eigh_f

    @xla_funcify.register(Eig)
    def _eig(op, node=None, **kw):
        def eig_f(x):
            # no eig on TPU: run on host via callback
            out_dtype = node.outputs[0].type.dtype
            n = x.shape[-1]
            w_t = jax.ShapeDtypeStruct(x.shape[:-2] + (n,), out_dtype)
            v_t = jax.ShapeDtypeStruct(x.shape, out_dtype)

            def _host(xv):
                w, v = np.linalg.eig(xv)
                return w.astype(out_dtype), v.astype(out_dtype)

            return jax.pure_callback(_host, (w_t, v_t), x)

        return eig_f

    @xla_funcify.register(QR)
    def _qr(op, node=None, **kw):
        def qr_f(x):
            res = jnp.linalg.qr(x, mode=op.mode)
            if op.mode == "r":
                return res
            return res[0], res[1]

        return qr_f

    @xla_funcify.register(SVD)
    def _svd(op, node=None, **kw):
        def svd_f(x):
            if op.compute_uv:
                return tuple(jnp.linalg.svd(x, full_matrices=op.full_matrices))
            return jnp.linalg.svd(x, compute_uv=False)

        return svd_f

    @xla_funcify.register(Lu)
    def _lu(op, node=None, **kw):
        def lu_f(x):
            return tuple(jsl.lu(x, permute_l=op.permute_l))

        return lu_f

    @xla_funcify.register(Expm)
    def _expm(op, node=None, **kw):
        return lambda x: jsl.expm(x)


_register_xla()


# --- long-tail decompositions / solvers ---------------------------------------
#
# Schur / QZ / ARE have no TPU-native XLA kernels (they are sequential
# LAPACK algorithms); like the reference's LAPACK-backed ops they run on
# the host CPU — here via jax.pure_callback inside the compiled executable.


class Schur(MatrixOp):
    """Real/complex Schur decomposition A = Z T Z^H (reference
    tensor/linalg/decomposition/schur.py)."""

    __props__ = ("output",)
    gufunc_signature = "(n,n)->(n,n),(n,n)"

    def __init__(self, output="real"):
        if output not in ("real", "complex"):
            raise ValueError("output must be 'real' or 'complex'")
        self.output = output

    def make_node(self, x):
        x = self._check_matrix(x)
        dtype = upcast_float(x.type.dtype)
        if self.output == "complex":
            dtype = "complex128" if dtype == "float64" else "complex64"
        t = TensorType(dtype, x.type.shape)
        return Apply(self, [x], [t(), t()])

    def infer_shape(self, fgraph, node, input_shapes):
        return [input_shapes[0], input_shapes[0]]

    def perform(self, node, inputs, output_storage):
        import scipy.linalg as sla

        T, Z = sla.schur(np.asarray(inputs[0]), output=self.output)
        dt = node.outputs[0].type.numpy_dtype
        output_storage[0][0] = T.astype(dt)
        output_storage[1][0] = Z.astype(dt)

    def L_op(self, inputs, outputs, output_grads):
        from pytensor_tpu.gradient import grad_undefined

        return [grad_undefined(self, 0, inputs[0],
                               "Schur has no gradient implementation")]


def schur(a, output="real"):
    return _core2(Schur(output=output), a, out_ndims=(2, 2))


class QZ(MatrixOp):
    """Generalized Schur (QZ) decomposition of (A, B) (reference
    tensor/linalg/decomposition qz)."""

    __props__ = ("output",)
    core_in_ndims = (2, 2)
    gufunc_signature = "(n,n),(n,n)->(n,n),(n,n),(n,n),(n,n)"

    def __init__(self, output="real"):
        if output not in ("real", "complex"):
            raise ValueError("output must be 'real' or 'complex'")
        self.output = output

    def make_node(self, a, b):
        a = self._check_matrix(a)
        b = self._check_matrix(b)
        dtype = upcast_float(upcast(a.type.dtype, b.type.dtype))
        if self.output == "complex":
            dtype = "complex128" if dtype == "float64" else "complex64"
        t = TensorType(dtype, a.type.shape)
        return Apply(self, [a, b], [t(), t(), t(), t()])

    def infer_shape(self, fgraph, node, input_shapes):
        return [input_shapes[0]] * 4

    def perform(self, node, inputs, output_storage):
        import scipy.linalg as sla

        AA, BB, Q, Z = sla.qz(np.asarray(inputs[0]), np.asarray(inputs[1]),
                              output=self.output)
        dt = node.outputs[0].type.numpy_dtype
        for k, v in enumerate((AA, BB, Q, Z)):
            output_storage[k][0] = v.astype(dt)

    def L_op(self, inputs, outputs, output_grads):
        from pytensor_tpu.gradient import grad_undefined

        return [grad_undefined(self, k, inputs[k],
                               "QZ has no gradient implementation")
                for k in range(2)]


def qz(a, b, output="real"):
    return _core2(QZ(output=output), a, b, out_ndims=(2, 2, 2, 2))


class TridiagonalSolve(MatrixOp):
    """Solve tridiag(dl, d, du) x = b.

    Diagonals follow the lax.linalg convention: each has length n with
    ``dl[0]`` and ``du[-1]`` ignored.  Reference
    tensor/linalg/solvers/tridiagonal.py; here the XLA lowering rides
    ``lax.linalg.tridiagonal_solve`` (O(n) Thomas algorithm on device).
    """

    __props__ = ("b_ndim",)
    core_in_ndims = (1, 1, 1, None)

    def __init__(self, b_ndim=1):
        if b_ndim not in (1, 2):
            raise ValueError("b_ndim must be 1 or 2")
        self.b_ndim = b_ndim
        self.core_in_ndims = (1, 1, 1, b_ndim)
        self.gufunc_signature = ("(n),(n),(n),(n)->(n)" if b_ndim == 1
                                 else "(n),(n),(n),(n,k)->(n,k)")

    def make_node(self, dl, d, du, b):
        dl, d, du, b = map(as_tensor_variable, (dl, d, du, b))
        if b.type.ndim != self.b_ndim:
            raise TypeError(f"b must have ndim={self.b_ndim}")
        dtype = upcast_float(upcast(dl.type.dtype, d.type.dtype,
                                    du.type.dtype, b.type.dtype))
        return Apply(self, [dl, d, du, b], [TensorType(dtype, b.type.shape)()])

    def infer_shape(self, fgraph, node, input_shapes):
        return [input_shapes[3]]

    def perform(self, node, inputs, output_storage):
        import scipy.linalg as sla

        dl, d, du, b = (np.asarray(v, dtype=node.outputs[0].type.numpy_dtype)
                        for v in inputs)
        n = d.shape[0]
        ab = np.zeros((3, n), dtype=d.dtype)
        ab[0, 1:] = du[:-1]
        ab[1, :] = d
        ab[2, :-1] = dl[1:]
        output_storage[0][0] = sla.solve_banded((1, 1), ab, b)

    def L_op(self, inputs, outputs, output_grads):
        from pytensor_tpu.tensor.basic import concatenate, zeros

        dl, d, du, b = inputs
        (x,) = outputs
        (xbar,) = output_grads
        z1 = zeros((1,), dtype=d.type.dtype)
        # A^T is tridiagonal with dl_T = shift-right(du), du_T = shift-left(dl)
        dl_T = concatenate([z1, du[:-1]])
        du_T = concatenate([dl[1:], z1])
        bbar = tridiagonal_solve(dl_T, d, du_T, xbar, b_ndim=self.b_ndim)
        if self.b_ndim == 1:
            prod = bbar * x
            lo = bbar[1:] * x[:-1]
            hi = bbar[:-1] * x[1:]
        else:
            prod = (bbar * x).sum(axis=-1)
            lo = (bbar[1:] * x[:-1]).sum(axis=-1)
            hi = (bbar[:-1] * x[1:]).sum(axis=-1)
        dbar = -prod
        dlbar = concatenate([z1, -lo])
        dubar = concatenate([-hi, z1])
        return [dlbar, dbar, dubar, bbar]


def tridiagonal_solve(dl, d, du, b, b_ndim=None):
    b = as_tensor_variable(b)
    if b_ndim is None:
        b_ndim = min(b.type.ndim, 2)
    op = TridiagonalSolve(b_ndim=b_ndim)
    return _core2(op, dl, d, du, b)


def lstsq(a, b, rcond=None):
    """Least squares via SVD, composed in-graph (differentiable, runs on
    the MXU; reference solvers lstsq wraps LAPACK gelsd).

    Returns (x, residuals, rank, singular_values) like np.linalg.lstsq,
    except ``residuals`` is always the per-column squared residual sum
    (static shape — TPU executables cannot return the empty array numpy
    uses for rank-deficient cases).
    """
    from pytensor_tpu.tensor.math import maximum, sum as pt_sum
    from pytensor_tpu.tensor.shape import shape

    a = as_tensor_variable(a)
    b = as_tensor_variable(b)
    u, s, vt = svd(a, full_matrices=False)
    m = shape(a)[-2]
    n = shape(a)[-1]
    if rcond is None:
        from pytensor_tpu.tensor.basic import cast

        eps = np.finfo(np.dtype(upcast_float(a.type.dtype))).eps
        rcond_v = cast(maximum(m, n), s.type.dtype) * eps
    else:
        rcond_v = as_tensor_variable(rcond)
    cutoff = rcond_v * s.max()
    keep = s > cutoff
    s_inv = tm.switch(keep, 1.0 / s, zeros_like(s))
    utb = dot(_mT(u), b)
    if b.type.ndim == 1:
        x = dot(_mT(vt), utb * s_inv)
    else:
        x = dot(_mT(vt), utb * s_inv[:, None])
    r = dot(a, x) - b
    residuals = pt_sum(r * r, axis=0)
    rank = keep.sum().astype("int64")
    return x, residuals, rank, s


class SolveDiscreteARE(MatrixOp):
    """Discrete algebraic Riccati equation solver (reference
    tensor/linalg/solvers/linear_control.py).  LAPACK-sequential: runs on
    host via callback, like the reference's scipy wrapper."""

    __props__ = ()
    core_in_ndims = (2, 2, 2, 2)
    gufunc_signature = "(n,n),(n,m),(n,n),(m,m)->(n,n)"

    def make_node(self, a, b, q, r):
        a, b, q, r = map(self._check_matrix, (a, b, q, r))
        dtype = upcast_float(upcast(*[v.type.dtype for v in (a, b, q, r)]))
        return Apply(self, [a, b, q, r],
                     [TensorType(dtype, a.type.shape)()])

    def infer_shape(self, fgraph, node, input_shapes):
        return [input_shapes[0]]

    def perform(self, node, inputs, output_storage):
        import scipy.linalg as sla

        X = sla.solve_discrete_are(*(np.asarray(v) for v in inputs))
        output_storage[0][0] = X.astype(node.outputs[0].type.numpy_dtype)

    def L_op(self, inputs, outputs, output_grads):
        # Implicit differentiation of the DARE fixed point
        # X = A^T X A - A^T X B (R + B^T X B)^-1 B^T X A + Q.
        # With K = (R + B^T X B)^-1 B^T X A and Acl = A - B K:
        #   Qbar   = S, where S solves the *adjoint* discrete Lyapunov
        #            equation S = Acl S Acl^T + Xbar_sym
        #   Abar   = 2 X Acl S
        #   Bbar   = -2 X Acl S K^T
        #   Rbar   = K S K^T
        # (standard result; see e.g. control-theory sensitivity analyses)
        from pytensor_tpu.gradient import disconnected_grad

        A, B, Q, R = inputs
        (X,) = outputs
        (Xbar,) = output_grads
        X = disconnected_grad(X)
        K = solve(R + matmul(_mT(B), matmul(X, B)),
                  matmul(_mT(B), matmul(X, A)), assume_a="gen")
        Acl = A - matmul(B, K)
        Xbar_sym = 0.5 * (Xbar + _mT(Xbar))
        S = solve_discrete_lyapunov(Acl, Xbar_sym, method="direct")
        XAclS = matmul(X, matmul(Acl, S))
        Abar = 2.0 * XAclS
        Bbar = -2.0 * matmul(XAclS, _mT(K))
        Qbar = S
        Rbar = matmul(K, matmul(S, _mT(K)))
        return [Abar, Bbar, Qbar, Rbar]


def solve_discrete_are(A, B, Q, R):
    return _core2(SolveDiscreteARE(), A, B, Q, R)


class SolveContinuousARE(SolveDiscreteARE):
    """Continuous ARE: A^T X + X A - X B R^-1 B^T X + Q = 0."""

    def perform(self, node, inputs, output_storage):
        import scipy.linalg as sla

        X = sla.solve_continuous_are(*(np.asarray(v) for v in inputs))
        output_storage[0][0] = X.astype(node.outputs[0].type.numpy_dtype)

    def L_op(self, inputs, outputs, output_grads):
        from pytensor_tpu.gradient import grad_undefined

        return [grad_undefined(self, k, inputs[k],
                               "continuous-ARE gradient not implemented")
                for k in range(4)]


def solve_continuous_are(A, B, Q, R):
    return _core2(SolveContinuousARE(), A, B, Q, R)


def _register_xla_longtail():
    import jax
    import jax.numpy as jnp

    from pytensor_tpu.link.xla.dispatch import xla_funcify

    def _host_cb(op, node):
        """Generic host-callback lowering for LAPACK-sequential ops."""
        out_types = [jax.ShapeDtypeStruct(
            tuple(d if d is not None else -1 for d in o.type.shape),
            o.type.numpy_dtype) for o in node.outputs]

        def run(*args):
            # resolve any unknown dims from the runtime input shapes
            shapes = [a.shape for a in args]
            outs = []
            for o, t in zip(node.outputs, out_types):
                shp = list(t.shape)
                # all longtail ops are square-ish: every unknown output dim
                # equals some input dim; probe inputs for a match by position
                for k, d in enumerate(shp):
                    if d == -1:
                        for s in shapes:
                            if len(s) > k:
                                shp[k] = s[k]
                                break
                outs.append(jax.ShapeDtypeStruct(tuple(shp), t.dtype))

            def _h(*vals):
                storage = [[None] for _ in node.outputs]
                op.perform(node, [np.asarray(v) for v in vals], storage)
                return tuple(np.asarray(s[0], dtype=t.dtype)
                             for s, t in zip(storage, outs))

            res = jax.pure_callback(_h, tuple(outs), *args)
            return res if len(res) > 1 else res[0]

        return run

    @xla_funcify.register(Schur)
    @xla_funcify.register(QZ)
    @xla_funcify.register(SolveDiscreteARE)
    @xla_funcify.register(SolveContinuousARE)
    def _lapack_host(op, node=None, **kw):
        return _host_cb(op, node)

    @xla_funcify.register(TridiagonalSolve)
    def _tridiag(op, node=None, **kw):
        def run(dl, d, du, b):
            b2 = b[:, None] if op.b_ndim == 1 else b
            x = jax.lax.linalg.tridiagonal_solve(dl, d, du, b2)
            return x[:, 0] if op.b_ndim == 1 else x

        return run


_register_xla_longtail()


# --- second long-tail batch: block_diag, eigvalsh, LU-factor interface,
# ordqz, lyapunov, tensorsolve/inv (reference tensor/linalg/ modules) ----


def block_diag(*matrices):
    """Block-diagonal assembly (reference BlockDiagonal op; here a graph
    composition — XLA pads/concats for free)."""
    from pytensor_tpu.tensor.basic import concatenate, zeros
    from pytensor_tpu.tensor.shape import shape

    mats = [as_tensor_variable(m) for m in matrices]
    if any(m.type.ndim != 2 for m in mats):
        raise TypeError("block_diag expects matrices")
    dtype = upcast(*[m.type.dtype for m in mats])
    mats = [m.astype(dtype) for m in mats]
    rows = []
    for i, m in enumerate(mats):
        row = []
        for j, other in enumerate(mats):
            if i == j:
                row.append(m)
            else:
                row.append(zeros((shape(m)[0], shape(other)[1]), dtype=dtype))
        rows.append(concatenate(row, axis=1))
    return concatenate(rows, axis=0)


def eigvalsh(a, b=None, lower=True):
    """Eigenvalues of a symmetric/hermitian (pencil) matrix."""
    if b is None:
        return eigh(a, UPLO="L" if lower else "U")[0]
    return GeneralizedEigvalsh(lower=lower)(a, b)


class GeneralizedEigvalsh(MatrixOp):
    """scipy.linalg.eigh(a, b, eigvals_only=True): LAPACK-sequential,
    host-callback like Schur/QZ."""

    __props__ = ("lower",)
    core_in_ndims = (2, 2)
    gufunc_signature = "(n,n),(n,n)->(n)"

    def __init__(self, lower=True):
        self.lower = bool(lower)

    def make_node(self, a, b):
        a = self._check_matrix(a)
        b = self._check_matrix(b)
        dtype = upcast_float(upcast(a.type.dtype, b.type.dtype))
        return Apply(self, [a, b],
                     [TensorType(dtype, (a.type.shape[0],))()])

    def infer_shape(self, fgraph, node, input_shapes):
        return [(input_shapes[0][0],)]

    def perform(self, node, inputs, output_storage):
        import scipy.linalg as sla

        w = sla.eigh(np.asarray(inputs[0]), np.asarray(inputs[1]),
                     lower=self.lower, eigvals_only=True)
        output_storage[0][0] = w.astype(node.outputs[0].type.numpy_dtype)

    def L_op(self, inputs, outputs, output_grads):
        from pytensor_tpu.gradient import grad_not_implemented

        return [grad_not_implemented(self, k, inputs[k],
                                     "generalized eigvalsh gradient")
                for k in range(2)]


class LUFactor(MatrixOp):
    """scipy.linalg.lu_factor: packed LU + pivots (host LAPACK)."""

    __props__ = ()
    gufunc_signature = "(n,n)->(n,n),(n)"

    def make_node(self, a):
        a = self._check_matrix(a)
        dtype = upcast_float(a.type.dtype)
        return Apply(self, [a], [TensorType(dtype, a.type.shape)(),
                                 TensorType("int32", (a.type.shape[0],))()])

    def infer_shape(self, fgraph, node, input_shapes):
        return [input_shapes[0], (input_shapes[0][0],)]

    def perform(self, node, inputs, output_storage):
        import scipy.linalg as sla

        lu_, piv = sla.lu_factor(np.asarray(inputs[0]))
        output_storage[0][0] = lu_.astype(node.outputs[0].type.numpy_dtype)
        output_storage[1][0] = piv.astype("int32")

    def L_op(self, inputs, outputs, output_grads):
        from pytensor_tpu.gradient import grad_not_implemented

        return [grad_not_implemented(self, 0, inputs[0],
                                     "packed-LU gradient (use lu/solve)")]


def lu_factor(a):
    return _core2(LUFactor(), a, out_ndims=(2, 1))


def lu_solve(lu_and_piv, b, trans=0, b_ndim=None):
    """Solve via a precomputed lu_factor pair."""
    lu_, piv = lu_and_piv
    lu_ = as_tensor_variable(lu_)
    piv = as_tensor_variable(piv)
    b = as_tensor_variable(b)
    if b_ndim is None:
        b_ndim = min(b.type.ndim, 2)
    return LUSolve(trans=trans, b_ndim=b_ndim)(lu_, piv, b)


class LUSolve(MatrixOp):
    __props__ = ("trans", "b_ndim")

    def __init__(self, trans=0, b_ndim=1):
        self.trans = int(trans)
        self.b_ndim = int(b_ndim)

    def make_node(self, lu_, piv, b):
        lu_ = self._check_matrix(lu_)
        piv = as_tensor_variable(piv)
        b = as_tensor_variable(b)
        dtype = upcast_float(upcast(lu_.type.dtype, b.type.dtype))
        return Apply(self, [lu_, piv, b], [TensorType(dtype, b.type.shape)()])

    def infer_shape(self, fgraph, node, input_shapes):
        return [input_shapes[2]]

    def perform(self, node, inputs, output_storage):
        import scipy.linalg as sla

        x = sla.lu_solve((np.asarray(inputs[0]), np.asarray(inputs[1])),
                         np.asarray(inputs[2]), trans=self.trans)
        output_storage[0][0] = x.astype(node.outputs[0].type.numpy_dtype)

    def L_op(self, inputs, outputs, output_grads):
        from pytensor_tpu.gradient import grad_not_implemented

        return [grad_not_implemented(self, k, inputs[k],
                                     "packed-LU solve gradient")
                for k in range(3)]


def ordqz(A, B, sort="lhp", output="real"):
    return OrdQZ(sort=sort, output=output)(A, B)


class OrdQZ(QZ):
    """Ordered QZ (reference solvers: scipy.linalg.ordqz wrapper)."""

    __props__ = ("output", "sort")

    def __init__(self, sort="lhp", output="real"):
        super().__init__(output=output)
        self.sort = sort

    def make_node(self, a, b):
        a = self._check_matrix(a)
        b = self._check_matrix(b)
        dtype = upcast_float(upcast(a.type.dtype, b.type.dtype))
        if self.output == "complex":
            dtype = "complex128" if dtype == "float64" else "complex64"
        t = TensorType(dtype, a.type.shape)
        n = a.type.shape[0]
        return Apply(self, [a, b],
                     [t(), t(),
                      TensorType("complex128", (n,))(),
                      TensorType(dtype, (n,))(),
                      t(), t()])

    def infer_shape(self, fgraph, node, input_shapes):
        s = input_shapes[0]
        return [s, s, (s[0],), (s[0],), s, s]

    def perform(self, node, inputs, output_storage):
        import scipy.linalg as sla

        AA, BB, alpha, beta, Q, Z = sla.ordqz(
            np.asarray(inputs[0]), np.asarray(inputs[1]), sort=self.sort,
            output=self.output)
        dt = node.outputs[0].type.numpy_dtype
        for k, v in enumerate((AA.astype(dt), BB.astype(dt),
                               alpha.astype("complex128"),
                               beta.astype(dt), Q.astype(dt), Z.astype(dt))):
            output_storage[k][0] = v

    def L_op(self, inputs, outputs, output_grads):
        from pytensor_tpu.gradient import grad_undefined

        return [grad_undefined(self, k, inputs[k], "ordqz gradient")
                for k in range(2)]


def pivot_to_permutation(piv):
    """LAPACK pivot vector -> permutation vector (host computation)."""
    piv = as_tensor_variable(piv)
    return PivotToPermutation()(piv)


class PivotToPermutation(Op):
    __props__ = ()

    def make_node(self, piv):
        piv = as_tensor_variable(piv)
        return Apply(self, [piv], [TensorType("int64", piv.type.shape)()])

    def perform(self, node, inputs, output_storage):
        piv = np.asarray(inputs[0])
        perm = np.arange(len(piv))
        for i, p in enumerate(piv):
            perm[i], perm[p] = perm[p], perm[i]
        output_storage[0][0] = perm.astype("int64")

    def infer_shape(self, fgraph, node, input_shapes):
        return [input_shapes[0]]

    def L_op(self, inputs, outputs, output_grads):
        from pytensor_tpu.gradient import grad_undefined

        return [grad_undefined(self, 0, inputs[0], "integer op")]


def solve_continuous_lyapunov(A, Q):
    """A X + X A^T = Q via the Sylvester direct method."""
    A = as_tensor_variable(A)
    return solve_sylvester(A, _mT(A), Q)


def tensorsolve(a, b, axes=None):
    """np.linalg.tensorsolve semantics via reshape + solve."""
    from pytensor_tpu.tensor.basic import moveaxis

    a = as_tensor_variable(a)
    b = as_tensor_variable(b)
    if axes is not None:
        a = moveaxis(a, list(axes), list(range(-len(axes), 0)))
    rest_nd = a.type.ndim - b.type.ndim
    if None in a.type.shape:
        raise ValueError("tensorsolve needs static shapes on TPU")
    prod_rest = int(np.prod(a.type.shape[b.type.ndim:]))
    A2 = a.reshape((-1, prod_rest))
    bv = b.flatten()
    x = solve(A2, bv, b_ndim=1)
    return x.reshape(a.type.shape[b.type.ndim:])


def tensorinv(a, ind=2):
    """np.linalg.tensorinv via reshape + inv."""
    a = as_tensor_variable(a)
    if None in a.type.shape:
        raise ValueError("tensorinv needs static shapes on TPU")
    lead = int(np.prod(a.type.shape[:ind]))
    trail = int(np.prod(a.type.shape[ind:]))
    if lead != trail:
        raise ValueError("tensorinv: leading/trailing dims must multiply equal")
    inv2 = inv(a.reshape((lead, trail)))
    return inv2.reshape(a.type.shape[ind:] + a.type.shape[:ind])


def _register_xla_longtail2():
    import jax

    from pytensor_tpu.link.xla.dispatch import xla_funcify

    from pytensor_tpu.tensor.linalg import _register_xla_longtail  # noqa: F401

    # reuse the generic host-callback lowering
    host_ops = (GeneralizedEigvalsh, LUFactor, LUSolve, OrdQZ,
                PivotToPermutation)

    def _host_cb(op, node):
        out_types = [jax.ShapeDtypeStruct(
            tuple(d if d is not None else -1 for d in o.type.shape),
            o.type.numpy_dtype) for o in node.outputs]

        def run(*args):
            shapes = [a.shape for a in args]
            outs = []
            for t in out_types:
                shp = list(t.shape)
                for k, d in enumerate(shp):
                    if d == -1:
                        for s in shapes:
                            if len(s) > k:
                                shp[k] = s[k]
                                break
                outs.append(jax.ShapeDtypeStruct(tuple(shp), t.dtype))

            def _h(*vals):
                storage = [[None] for _ in node.outputs]
                op.perform(node, [np.asarray(v) for v in vals], storage)
                return tuple(np.asarray(s[0], dtype=t.dtype)
                             for s, t in zip(storage, outs))

            res = jax.pure_callback(_h, tuple(outs), *args)
            return res if len(res) > 1 else res[0]

        return run

    for cls in host_ops:
        @xla_funcify.register(cls)
        def _lower(op, node=None, **kw):
            return _host_cb(op, node)


_register_xla_longtail2()


# --- reference class-name surface ------------------------------------------
# Real-op aliases (the reference uses these class names; ours differ):
LU = Lu                                  # slinalg.LU
PivotToPermutations = PivotToPermutation  # slinalg.PivotToPermutations
Eigvalsh = GeneralizedEigvalsh           # slinalg.Eigvalsh (pencil eigvals)


class _CompositionalCtor:
    """Reference-constructor compat for capabilities this build lowers
    compositionally instead of as dedicated Ops (PARITY.md §2.5: the
    compositional graphs expose their structure to the generic rewrite
    packs, which the monolithic reference Ops cannot).  Instantiating
    and calling one of these builds exactly the graph of the matching
    function API."""

    _fn = None

    def __init__(self, **kwargs):
        self._kwargs = kwargs

    def __call__(self, *args):
        return type(self)._builder(*args, **self._kwargs)


class KroneckerProduct(_CompositionalCtor):
    """Reference slinalg.KroneckerProduct; builds kron(a, b)."""

    _builder = staticmethod(kron)


class BaseBlockDiagonal(_CompositionalCtor):
    """Reference slinalg.BaseBlockDiagonal."""

    def __init__(self, n_inputs=None, **kwargs):
        super().__init__(**kwargs)
        self.n_inputs = n_inputs


class BlockDiagonal(BaseBlockDiagonal):
    """Reference slinalg.BlockDiagonal; builds block_diag(*mats)."""

    _builder = staticmethod(block_diag)

    def __call__(self, *mats):
        if self.n_inputs is not None and len(mats) != self.n_inputs:
            raise ValueError(
                f"BlockDiagonal expected {self.n_inputs} inputs, "
                f"got {len(mats)}")
        return block_diag(*mats)


class MatrixPinv(_CompositionalCtor):
    """Reference nlinalg.MatrixPinv; builds the SVD/eigh pinv graph."""

    def __init__(self, hermitian=False):
        super().__init__(hermitian=hermitian)
        self.hermitian = hermitian

    _builder = staticmethod(pinv)


class Lstsq(_CompositionalCtor):
    """Reference nlinalg.Lstsq; builds the SVD lstsq graph (4 outputs)."""

    _builder = staticmethod(lstsq)


class TensorInv(_CompositionalCtor):
    """Reference nlinalg.TensorInv; builds the reshape+inv graph."""

    def __init__(self, ind=2):
        super().__init__(ind=ind)
        self.ind = ind

    _builder = staticmethod(tensorinv)


class TensorSolve(_CompositionalCtor):
    """Reference nlinalg.TensorSolve; builds the reshape+solve graph."""

    def __init__(self, axes=None):
        super().__init__(axes=axes)
        self.axes = axes

    _builder = staticmethod(tensorsolve)
