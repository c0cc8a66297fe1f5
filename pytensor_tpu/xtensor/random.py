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
              "categorical", "integers"):
    setattr(_mod, _name, _make(_name))
