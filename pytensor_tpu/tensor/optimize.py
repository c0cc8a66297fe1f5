"""Optimization ops: minimize/root wrappers with implicit-function grads.

Parallels /root/reference/pytensor/tensor/optimize.py (MinimizeOp:672,
MinimizeScalarOp:552, RootOp:1043, RootScalarOp:886): wrap an inner
objective graph; forward runs the solver, gradients come from the
implicit function theorem (differentiate the optimality condition).
TPU-first: the solver loop runs via jax.scipy.optimize / a native jax
Newton loop under jit; the oracle uses scipy.optimize.
"""

from __future__ import annotations

import numpy as np

from pytensor_tpu.compile.builders import OpFromGraph
from pytensor_tpu.graph.basic import Apply, Variable
from pytensor_tpu.graph.fg import FunctionGraph
from pytensor_tpu.graph.null_type import DisconnectedType
from pytensor_tpu.graph.op import HasInnerGraph, Op
from pytensor_tpu.graph.traversal import graph_inputs
from pytensor_tpu.tensor.basic import as_tensor_variable
from pytensor_tpu.tensor.type import TensorType


class MinimizeOp(Op, HasInnerGraph):
    """argmin_x f(x, *args); inputs (x0, *args) -> (x_star, success).

    Gradient wrt args via the implicit function theorem on the
    stationarity condition grad_x f(x*, args) = 0:
        d x*/d args = - H_xx^{-1} H_x,args
    """

    default_output = 0

    def __init__(self, fgraph: FunctionGraph, method="BFGS", optimizer_kwargs=None):
        # fgraph: inputs [x, *args], outputs [objective]
        self.fgraph = fgraph
        self.method = method
        self.optimizer_kwargs = optimizer_kwargs or {}
        self._fn = None

    def __eq__(self, other):
        return self is other

    def __hash__(self):
        return id(self)

    @property
    def inner_inputs(self):
        return self.fgraph.inputs

    @property
    def inner_outputs(self):
        return self.fgraph.outputs

    def clone(self):
        import copy as _copy

        res = _copy.copy(self)
        res.fgraph = self.fgraph.clone()
        res._fn = None
        return res

    def make_node(self, x0, *args):
        x0 = as_tensor_variable(x0)
        args = [as_tensor_variable(a) for a in args]
        success = TensorType("bool", ())()
        return Apply(self, [x0, *args], [x0.type(), success])

    def _objective_callable(self):
        if self._fn is None:
            from pytensor_tpu.link.xla.linker import fgraph_to_jax

            inner = fgraph_to_jax(self.fgraph)

            def fn(x, *args):
                return inner(x, *args)[0]

            self._fn = fn
        return self._fn

    def perform(self, node, inputs, output_storage):
        import scipy.optimize as sopt

        x0, *args = inputs
        fn = self._objective_callable()

        def obj(x):
            return float(np.asarray(fn(np.asarray(x, dtype=x0.dtype).reshape(np.shape(x0)),
                                        *args)))

        res = sopt.minimize(obj, np.asarray(x0).ravel(), method=self.method,
                            **self.optimizer_kwargs)
        output_storage[0][0] = np.asarray(res.x, dtype=node.outputs[0].type.numpy_dtype
                                          ).reshape(np.shape(x0))
        output_storage[1][0] = np.asarray(bool(res.success))

    def L_op(self, inputs, outputs, output_grads):
        from pytensor_tpu.gradient import pullback
        from pytensor_tpu.graph.basic import clone_get_equiv
        from pytensor_tpu.tensor.linalg import solve
        from pytensor_tpu import gradient as G

        x0, *args = inputs
        x_star = outputs[0]
        (gx, _) = output_grads

        # re-express the objective at x_star with outer args; cut the graph
        # at x_star (disconnected_grad) so the inner grads do not recurse
        # into this op's own L_op
        x_cut = G.disconnected_grad(x_star)
        memo = {self.fgraph.inputs[0]: x_cut}
        for iv, a in zip(self.fgraph.inputs[1:], args):
            memo[iv] = a
        memo = clone_get_equiv(self.fgraph.inputs, self.fgraph.outputs,
                               copy_inputs=False, copy_orphans=False, memo=memo)
        obj = memo[self.fgraph.outputs[0]]
        gstar = G.grad(obj, x_cut, disconnected_inputs="ignore")
        if x_star.type.ndim == 0:
            hess = G.grad(gstar, x_cut, disconnected_inputs="ignore")
            lam = -gx / hess
            grads = [DisconnectedType()()]
            for a in args:
                cross = G.grad(gstar * G.disconnected_grad(lam), a,
                               disconnected_inputs="ignore")
                grads.append(cross)
            return grads
        from pytensor_tpu.gradient import hessian

        H = hessian(obj, x_cut)
        lam = -solve(H, gx, assume_a="sym", b_ndim=1)
        grads = [DisconnectedType()()]
        for a in args:
            inner_prod = (gstar * G.disconnected_grad(lam)).sum()
            grads.append(G.grad(inner_prod, a, disconnected_inputs="ignore"))
        return grads

    def __str__(self):
        return f"MinimizeOp{{{self.method}}}"


def minimize(objective, x, method="BFGS", optimizer_kwargs=None, debug=False):
    """Symbolic argmin of ``objective`` wrt variable ``x``; all other
    graph inputs become implicit parameters with IFT gradients."""
    x = as_tensor_variable(x)
    params = [
        v for v in graph_inputs([objective])
        if v is not x and not isinstance(v, (type(None),))
        and v.owner is None and not _is_constant(v)
    ]
    fg = FunctionGraph([x, *params], [objective], clone=True)
    op = MinimizeOp(fg, method=method, optimizer_kwargs=optimizer_kwargs)
    x_star = op(x, *params)
    success = x_star.owner.outputs[1]
    return (x_star, success), op


def _is_constant(v):
    from pytensor_tpu.graph.basic import Constant

    return isinstance(v, Constant)


class RootOp(MinimizeOp):
    """Solve f(x, args) = 0; grad via dx*/dargs = -J_x^{-1} J_args."""

    def perform(self, node, inputs, output_storage):
        import scipy.optimize as sopt

        x0, *args = inputs
        fn = self._objective_callable()

        def fun(x):
            return np.asarray(fn(np.asarray(x, dtype=x0.dtype).reshape(np.shape(x0)),
                                 *args)).ravel()

        res = sopt.root(fun, np.asarray(x0).ravel(), method="hybr")
        output_storage[0][0] = np.asarray(
            res.x, dtype=node.outputs[0].type.numpy_dtype
        ).reshape(np.shape(x0))
        output_storage[1][0] = np.asarray(bool(res.success))

    def L_op(self, inputs, outputs, output_grads):
        from pytensor_tpu import gradient as G
        from pytensor_tpu.graph.basic import clone_get_equiv
        from pytensor_tpu.tensor.linalg import solve

        x0, *args = inputs
        x_star = outputs[0]
        (gx, _) = output_grads
        x_cut = G.disconnected_grad(x_star)
        memo = {self.fgraph.inputs[0]: x_cut}
        for iv, a in zip(self.fgraph.inputs[1:], args):
            memo[iv] = a
        memo = clone_get_equiv(self.fgraph.inputs, self.fgraph.outputs,
                               copy_inputs=False, copy_orphans=False, memo=memo)
        f_star = memo[self.fgraph.outputs[0]]
        if x_star.type.ndim == 0:
            jxx = G.grad(f_star, x_cut, disconnected_inputs="ignore")
            lam = -gx / jxx
            grads = [DisconnectedType()()]
            for a in args:
                grads.append(G.grad(f_star * G.disconnected_grad(lam), a,
                                    disconnected_inputs="ignore"))
            return grads
        from pytensor_tpu.gradient import jacobian

        J = jacobian(f_star, x_cut)
        from pytensor_tpu.tensor.basic import matrix_transpose

        lam = -solve(matrix_transpose(J), gx, b_ndim=1)
        grads = [DisconnectedType()()]
        for a in args:
            inner_prod = (f_star * G.disconnected_grad(lam)).sum()
            grads.append(G.grad(inner_prod, a, disconnected_inputs="ignore"))
        return grads

    def __str__(self):
        return "RootOp"


def root(equations, variables, method="hybr", optimizer_kwargs=None):
    x = as_tensor_variable(variables)
    params = [
        v for v in graph_inputs([equations])
        if v is not x and v.owner is None and not _is_constant(v)
    ]
    fg = FunctionGraph([x, *params], [equations], clone=True)
    op = RootOp(fg, optimizer_kwargs=optimizer_kwargs)
    x_star = op(x, *params)
    return (x_star, x_star.owner.outputs[1]), op


class MinimizeScalarOp(MinimizeOp):
    """argmin over a SCALAR variable via scipy.optimize.minimize_scalar
    (reference MinimizeScalarOp:552) — bracketing methods (brent/golden)
    on the oracle; the device path runs safeguarded Newton on the
    stationarity condition (inherited lowering)."""

    def __init__(self, fgraph, method="brent", optimizer_kwargs=None):
        super().__init__(fgraph, method=method,
                         optimizer_kwargs=optimizer_kwargs)

    def perform(self, node, inputs, output_storage):
        import scipy.optimize as sopt

        x0, *args = inputs
        fn = self._objective_callable()

        def obj(x):
            return float(np.asarray(fn(np.asarray(x, dtype=x0.dtype), *args)))

        res = sopt.minimize_scalar(obj, method=self.method,
                                   **self.optimizer_kwargs)
        output_storage[0][0] = np.asarray(
            res.x, dtype=node.outputs[0].type.numpy_dtype)
        output_storage[1][0] = np.asarray(bool(res.success))

    def __str__(self):
        return f"MinimizeScalarOp{{{self.method}}}"


def minimize_scalar(objective, x, method="brent", optimizer_kwargs=None):
    """Symbolic scalar argmin (reference minimize_scalar): ``x`` must be a
    0-d variable; every other root input becomes an IFT-differentiated
    parameter."""
    x = as_tensor_variable(x)
    if x.type.ndim != 0:
        raise ValueError("minimize_scalar requires a scalar variable; "
                         "use minimize for vectors")
    params = [
        v for v in graph_inputs([objective])
        if v is not x and v.owner is None and not _is_constant(v)
    ]
    fg = FunctionGraph([x, *params], [objective], clone=True)
    op = MinimizeScalarOp(fg, method=method, optimizer_kwargs=optimizer_kwargs)
    x_star = op(x, *params)
    return (x_star, x_star.owner.outputs[1]), op


class RootScalarOp(RootOp):
    """Solve f(x) = 0 for SCALAR x via scipy.optimize.root_scalar
    (reference RootScalarOp:886); Newton with the autodiffed fprime on
    the oracle, Newton under jit on the device (inherited lowering)."""

    def __init__(self, fgraph, method="newton", optimizer_kwargs=None):
        super().__init__(fgraph, method=method,
                         optimizer_kwargs=optimizer_kwargs)
        self._fprime = None

    def clone(self):
        res = super().clone()
        res._fprime = None
        return res

    def _fprime_callable(self):
        if self._fprime is None:
            import jax

            from pytensor_tpu.link.xla.linker import fgraph_to_jax

            inner = fgraph_to_jax(self.fgraph)
            self._fprime = jax.grad(lambda x, *a: inner(x, *a)[0])
        return self._fprime

    def perform(self, node, inputs, output_storage):
        import scipy.optimize as sopt

        x0, *args = inputs
        fn = self._objective_callable()

        def f(x):
            return float(np.asarray(fn(np.asarray(x, dtype=x0.dtype), *args)))

        kwargs = dict(self.optimizer_kwargs)
        if self.method in ("newton", "halley") and "fprime" not in kwargs:
            fp = self._fprime_callable()
            kwargs["fprime"] = lambda x: float(np.asarray(
                fp(np.asarray(x, dtype=x0.dtype), *args)))
        res = sopt.root_scalar(f, x0=float(np.asarray(x0)),
                               method=self.method, **kwargs)
        output_storage[0][0] = np.asarray(
            res.root, dtype=node.outputs[0].type.numpy_dtype)
        output_storage[1][0] = np.asarray(bool(res.converged))

    def __str__(self):
        return f"RootScalarOp{{{self.method}}}"


def root_scalar(equation, variables, method="newton", optimizer_kwargs=None):
    """Symbolic scalar root (reference root_scalar)."""
    x = as_tensor_variable(variables)
    if x.type.ndim != 0:
        raise ValueError("root_scalar requires a scalar variable; "
                         "use root for systems")
    params = [
        v for v in graph_inputs([equation])
        if v is not x and v.owner is None and not _is_constant(v)
    ]
    fg = FunctionGraph([x, *params], [equation], clone=True)
    op = RootScalarOp(fg, method=method, optimizer_kwargs=optimizer_kwargs)
    x_star = op(x, *params)
    return (x_star, x_star.owner.outputs[1]), op


def _register_xla():
    from pytensor_tpu.link.xla.dispatch import xla_funcify

    @xla_funcify.register(MinimizeOp)
    def _minimize(op, node=None, **kw):
        import jax
        import jax.numpy as jnp

        from pytensor_tpu.link.xla.linker import fgraph_to_jax

        inner = fgraph_to_jax(op.fgraph)
        is_root = isinstance(op, RootOp)

        def obj(x, *args):
            return inner(x, *args)[0]

        def solve_fn(x0, *args):
            if is_root:
                # damped Newton iterations under jit
                def step(carry, _):
                    x, = carry
                    f = obj(x, *args)
                    J = jax.jacobian(lambda xx: obj(xx, *args))(x)
                    if jnp.ndim(x) == 0:
                        dx = f / J
                    else:
                        dx = jnp.linalg.solve(J, f)
                    return (x - dx,), None

                (x_star,), _ = jax.lax.scan(step, (jnp.asarray(x0),), None,
                                            length=25)
                resid = obj(x_star, *args)
                ok = jnp.all(jnp.abs(resid) < 1e-8)
                return x_star, ok
            # minimize: jax BFGS
            from jax.scipy.optimize import minimize as jmin

            flat0 = jnp.ravel(jnp.asarray(x0))

            def fobj(xf):
                return obj(xf.reshape(jnp.shape(x0)), *args)

            res = jmin(fobj, flat0, method="BFGS")
            return res.x.reshape(jnp.shape(x0)), jnp.asarray(res.success)

        return solve_fn


_register_xla()
