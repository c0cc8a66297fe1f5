"""Dim-aware random draws (reference xtensor/random/: XRV wrappers).

``normal(srng, 0.0, 1.0, dims={"chain": 4, "param": 3})`` draws with the
given named dims; parameters may be xtensors, aligned by dim name.
"""

from __future__ import annotations

import sys

import pytensor_tpu.tensor.random as ptr
from pytensor_tpu.xtensor.type import XTensorVariable, as_xtensor


def _draw(srng, rv, params, dims):
    if isinstance(dims, dict):
        names = tuple(dims)
        sizes = tuple(int(v) for v in dims.values())
    else:
        raise TypeError("dims must be a {name: size} dict")
    t_params = []
    for p in params:
        if isinstance(p, XTensorVariable):
            # align the parameter's dims to the draw dims (broadcast)
            order = []
            for d in names:
                if d in p.type.dims:
                    order.append(p.type.dims.index(d))
            missing = [d for d in p.type.dims if d not in names]
            if missing:
                raise ValueError(f"param dims {missing} not in draw dims {names}")
            from pytensor_tpu.tensor.elemwise import DimShuffle

            t = p.values
            new_order = ["x" if d not in p.type.dims
                         else p.type.dims.index(d) for d in names]
            t_params.append(DimShuffle(t.type.ndim, new_order)(t))
        else:
            t_params.append(p)
    draws = srng.gen(rv, *t_params, size=sizes)
    from pytensor_tpu.tensor.shape import specify_shape

    return as_xtensor(specify_shape(draws, sizes), dims=names)


def _make(name):
    rv = getattr(ptr, name)

    def fn(srng, *params, dims):
        return _draw(srng, rv, params, dims)

    fn.__name__ = name
    fn.__doc__ = f"dim-aware {name} draw: {name}(srng, *params, dims={{...}})"
    return fn


_mod = sys.modules[__name__]
for _name in ("uniform", "normal", "halfnormal", "lognormal", "beta", "gamma",
              "exponential", "poisson", "bernoulli", "binomial", "laplace",
              "cauchy", "logistic", "t", "invgamma", "geometric",
              "categorical", "integers",
              # breadth parity with reference xtensor/random/basic.py:185
              "betabinom", "gengamma", "gumbel", "halfcauchy",
              "hypergeometric", "negative_binomial", "pareto", "triangular",
              "truncexpon", "vonmises", "wald", "weibull", "standard_normal",
              "chisquare", "rayleigh"):
    setattr(_mod, _name, _make(_name))

nbinom = negative_binomial  # noqa: F821  (generated above)


def _align_param(p, batch_names, core_dims):
    """Align an xtensor param to (batch..., core...) tensor layout."""
    from pytensor_tpu.tensor.elemwise import DimShuffle

    if not isinstance(p, XTensorVariable):
        return p
    extra = [d for d in p.type.dims
             if d not in batch_names and d not in core_dims]
    if extra:
        raise ValueError(
            f"param dims {extra} not in draw dims {batch_names} "
            f"or core dims {core_dims}")
    t = p.values
    order = ["x" if d not in p.type.dims else p.type.dims.index(d)
             for d in (*batch_names, *core_dims)]
    if order == list(range(t.type.ndim)):
        return t
    return DimShuffle(t.type.ndim, tuple(order))(t)


def _draw_core(srng, rv, params, param_core_dims, out_core_dims, dims):
    """Draw an RV whose params/output carry CORE dims (reference
    xtensor/random/basic.py:56 as_xrv core_dims machinery)."""
    if not isinstance(dims, dict):
        raise TypeError("dims must be a {name: size} dict")
    names = tuple(dims)
    sizes = tuple(int(v) for v in dims.values())
    t_params = [_align_param(p, names, cd)
                for p, cd in zip(params, param_core_dims)]
    draws = srng.gen(rv, *t_params, size=sizes)
    out_dims = (*names, *out_core_dims)
    return as_xtensor(draws, dims=out_dims)


def multivariate_normal(srng, mean, cov, *, core_dims, dims=None,
                        method="cholesky"):
    """Dim-aware MvNormal: ``core_dims=(support, support2)`` names the
    two axes of cov; mean carries the support dim (reference
    xtensor/random/basic.py:152)."""
    import pytensor_tpu.tensor.random as _ptr

    mean = as_xtensor(mean)
    core_dims = tuple(core_dims)
    if len(core_dims) != 2:
        raise ValueError(
            f"multivariate_normal requires 2 core_dims, got {len(core_dims)}")
    # the dim present in mean is the support (output) dim
    if core_dims[0] not in mean.type.dims:
        core_dims = core_dims[::-1]
    rv = _ptr.multivariate_normal
    if method != "cholesky":
        from pytensor_tpu.tensor.random.basic import MvNormalRV

        rv = MvNormalRV(method=method) if "method" in getattr(
            MvNormalRV, "__props__", ()) else rv
    return _draw_core(srng, rv, (mean, cov),
                      ((core_dims[0],), core_dims),
                      (core_dims[0],), dims or {})


def dirichlet(srng, alphas, *, core_dims, dims=None):
    """Dim-aware Dirichlet; ``core_dims`` names the simplex axis."""
    import pytensor_tpu.tensor.random as _ptr

    if isinstance(core_dims, str):
        core_dims = (core_dims,)
    core_dims = tuple(core_dims)
    if len(core_dims) != 1:
        raise ValueError("dirichlet takes exactly one core dim")
    return _draw_core(srng, _ptr.dirichlet, (alphas,), (core_dims,),
                      core_dims, dims or {})


def multinomial(srng, n, p, *, core_dims, dims=None):
    """Dim-aware Multinomial; ``core_dims`` names the category axis."""
    import pytensor_tpu.tensor.random as _ptr

    if isinstance(core_dims, str):
        core_dims = (core_dims,)
    core_dims = tuple(core_dims)
    if len(core_dims) != 1:
        raise ValueError("multinomial takes exactly one core dim")
    return _draw_core(srng, _ptr.multinomial, (n, p), ((), core_dims),
                      core_dims, dims or {})
