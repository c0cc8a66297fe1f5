"""Scalar op descriptors: the element-wise kernel table.

Parallels /root/reference/pytensor/scalar/basic.py (ScalarOp:1151 and ~80
concrete ops) but TPU-first: instead of per-op C code, each descriptor
carries a numpy reference impl (the testing oracle) and a jax impl (the
XLA lowering used by Elemwise/CAReduce and the Pallas fusion emitter).
Gradient rules are written directly against tensor-level graph
constructors, which removes the reference's scalar-graph lifting
machinery (tensor/elemwise.py:607 ``_bgrad``) with identical semantics.
"""

from __future__ import annotations

from typing import Callable, Sequence

import numpy as np

from pytensor_tpu.config import config
from pytensor_tpu.utils import MetaObject

discrete_kinds = "biu"


def upcast(*dtypes: str) -> str:
    """numpy-style dtype promotion with bfloat16 handled explicitly."""
    dtypes = [str(d) for d in dtypes]
    has_bf16 = "bfloat16" in dtypes
    rest = [d for d in dtypes if d != "bfloat16"]
    if not rest:
        return "bfloat16"
    out = str(np.result_type(*rest))
    if not has_bf16:
        return out
    if out in ("float64",):
        return "float64"
    if out in ("float32",):
        return "float32"
    if out == "float16":
        return "float32"
    if np.dtype(out).kind in discrete_kinds:
        return "bfloat16"
    return out


def upcast_float(*dtypes: str) -> str:
    out = upcast(*dtypes)
    if out == "bfloat16":
        return out
    if np.dtype(out).kind in discrete_kinds:
        # reference upgrade_to_float semantics: discrete inputs promote to
        # the smallest float that holds them (bool/int8/int16 -> float32,
        # int32/int64 -> float64), independent of floatX
        return str(np.promote_types(np.dtype(out), np.float32))
    return out


def _dg():
    """Lazy import of gradient helpers (avoids circular imports)."""
    from pytensor_tpu import gradient

    return gradient


class ScalarOp(MetaObject):
    """Descriptor of an elementwise scalar kernel.

    name         unique identifier (defines op equality)
    nin          arity; -1 = variadic (add/mul)
    np_fn        numpy ufunc-like reference implementation
    jax_fn       jax.numpy implementation (the XLA lowering)
    grad_fn      (inputs, outputs, output_grads) -> list of input grads,
                 written with tensor-level constructors
    dtype_rule   'upcast' | 'float' | 'bool' | 'first' | callable(*dtypes)
    identity     neutral element for variadic folding / CAReduce
    """

    __props__ = ("name",)

    def __init__(
        self,
        name: str,
        nin: int,
        np_fn: Callable,
        jax_fn: Callable,
        grad_fn: Callable | None = None,
        dtype_rule="upcast",
        identity=None,
        commutative: bool = False,
        nout: int = 1,
    ):
        self.name = name
        self.nin = nin
        self.nout = nout
        self.np_fn = np_fn
        self.jax_fn = jax_fn
        self.grad_fn = grad_fn
        self.dtype_rule = dtype_rule
        self.identity = identity
        self.commutative = commutative

    def output_dtype(self, *input_dtypes: str) -> str:
        rule = self.dtype_rule
        if callable(rule):
            return rule(*input_dtypes)
        if rule == "upcast":
            return upcast(*input_dtypes)
        if rule == "float":
            return upcast_float(*input_dtypes)
        if rule == "bool":
            return "bool"
        if rule == "first":
            return str(input_dtypes[0])
        raise ValueError(f"unknown dtype rule {rule}")

    def impl(self, *args):
        return self.np_fn(*args)

    def grad(self, inputs, outputs, output_grads):
        if self.grad_fn is None:
            return [
                _dg().grad_not_implemented(self, i, inp)
                for i, inp in enumerate(inputs)
            ]
        return self.grad_fn(inputs, outputs, output_grads)

    def __str__(self):
        return self.name

    def __reduce__(self):
        # lambdas inside are not picklable: restore from the registry
        if self.name.startswith("cast{"):
            return (cast_op, (self.name[5:-1],))
        return (get_scalar_op, (self.name,))

    def __call__(self, *inputs):
        """Apply at the tensor level (scalar ops act through Elemwise)."""
        from pytensor_tpu.tensor.elemwise import Elemwise

        return Elemwise(self)(*inputs)


def _zero_like(x):
    return x.zeros_like(dtype=config.floatX) if _is_discrete(x) else x.zeros_like()


def _is_discrete(x):
    return np.dtype(x.type.dtype if x.type.dtype != "bfloat16" else "float32").kind in discrete_kinds


def _disc(op, idx, inp):
    """Gradient wrt a discrete input: disconnected (reference convention)."""
    return _dg().grad_undefined(op, idx, inp, "grad wrt discrete input")


_registry: dict[str, ScalarOp] = {}

# Reference-parity class names (reference scalar/basic.py:1835+ defines one
# class per op; downstream code dispatches with
# ``isinstance(node.op.scalar_op, Exp)``).  Every kernel registered through
# ``_op`` gets its own generated ScalarOp subclass so that idiom works;
# names follow the reference exactly (overrides below, CamelCase default).
_CLASS_NAME_OVERRIDES = {
    "and_": "AND", "or_": "OR", "xor": "XOR", "invert": "Invert",
    "eq": "EQ", "neq": "NEQ", "lt": "LT", "gt": "GT", "le": "LE",
    "ge": "GE", "true_div": "TrueDiv", "int_div": "IntDiv",
    "arccos": "ArcCos", "arccosh": "ArcCosh", "arcsin": "ArcSin",
    "arcsinh": "ArcSinh", "arctan": "ArcTan", "arctan2": "ArcTan2",
    "arctanh": "ArcTanh", "gammaln": "GammaLn", "gammainc": "GammaInc",
    "gammaincc": "GammaIncC", "gammaincinv": "GammaIncInv",
    "gammainccinv": "GammaIncCInv", "betainc": "BetaInc",
    "betaincinv": "BetaIncInv", "log1mexp": "Log1mexp",
    "hyp2f1": "Hyp2F1", "owens_t": "Owens_t", "ndtri_exp": "NdtriExp",
    "psi": "Psi", "tri_gamma": "TriGamma", "polygamma": "PolyGamma",
    "isnan": "IsNan", "isinf": "IsInf", "i0": "I0", "i1": "I1",
    "iv": "Iv", "ive": "Ive", "j0": "J0", "j1": "J1", "jv": "Jv",
    "kv": "Kv", "kve": "Kve", "deg2rad": "Deg2Rad", "rad2deg": "Rad2Deg",
    "xlogy": "XLogY", "xlog1py": "XLog1PY",
}

_op_classes: dict[str, type] = {}


def _camel(name: str) -> str:
    return "".join(p[0].upper() + p[1:] if p[0].isalpha() else p
                   for p in name.split("_") if p)


def _op_class(name: str) -> type:
    """Per-kernel ScalarOp subclass under the reference's class name.

    All cast kernels share one ``Cast`` class (reference Cast:2435)."""
    key = ("Cast" if name.startswith("cast{")
           else _CLASS_NAME_OVERRIDES.get(name, _camel(name)))
    cls = _op_classes.get(key)
    if cls is None:
        cls = type(key, (ScalarOp,), {"__module__": __name__})
        _op_classes[key] = cls
        globals()[key] = cls
    return cls


def _default_init(self, *args, **kwargs):
    """Reference ops construct bare (``ps.Second()``); default to the
    canonical kernel configuration when called with no arguments."""
    if not args and not kwargs and type(self).__dict__.get("_defaults"):
        args, kwargs = type(self)._defaults
    ScalarOp.__init__(self, *args, **kwargs)


def _op(name, nin, np_fn, jax_fn, grad_fn=None, **kw) -> ScalarOp:
    cls = _op_class(name)
    op = cls(name, nin, np_fn, jax_fn, grad_fn, **kw)
    if "_defaults" not in cls.__dict__:
        cls._defaults = ((name, nin, np_fn, jax_fn, grad_fn), dict(kw))
        cls.__init__ = _default_init
    _registry[name] = op
    return op


def get_scalar_op(name: str) -> ScalarOp:
    if name not in _registry:
        if name.startswith("cast{"):
            return cast_op(name[5:-1])
        # special-function kernels register on first import of scalar.math
        import pytensor_tpu.scalar.math  # noqa: F401
    return _registry[name]


def _jnp():
    import jax.numpy as jnp

    return jnp


def _jsp():
    import jax.scipy.special as jsp

    return jsp


def _tm():
    from pytensor_tpu.tensor import math as tm

    return tm


# ---------------------------------------------------------------------------
# arithmetic
# ---------------------------------------------------------------------------

add = _op(
    "add", -1, lambda *a: np.add.reduce(np.broadcast_arrays(*a)) if len(a) > 2 else np.add(*a),
    lambda *a: _sum_jax(a),
    lambda i, o, gz: [gz[0]] * len(i),
    identity=0, commutative=True,
)


def _sum_jax(args):
    jnp = _jnp()
    acc = args[0]
    for x in args[1:]:
        acc = jnp.add(acc, x)
    return acc


def _prod_jax(args):
    jnp = _jnp()
    acc = args[0]
    for x in args[1:]:
        acc = jnp.multiply(acc, x)
    return acc


def _mul_np(*a):
    return np.multiply.reduce(np.broadcast_arrays(*a)) if len(a) > 2 else np.multiply(*a)


def _mul_grad(i, o, gz):
    tm = _tm()
    grads = []
    for k in range(len(i)):
        others = [x for j, x in enumerate(i) if j != k]
        g = gz[0]
        for x in others:
            g = g * x
        grads.append(g)
    return grads


mul = _op("mul", -1, _mul_np, lambda *a: _prod_jax(a), _mul_grad, identity=1, commutative=True)

sub = _op("sub", 2, np.subtract, lambda a, b: _jnp().subtract(a, b),
          lambda i, o, gz: [gz[0], -gz[0]])


def _true_div_grad(i, o, gz):
    x, y = i
    return [gz[0] / y, -gz[0] * x / (y * y)]


def _upgrade_to_float(*dtypes):
    # reference upgrade_to_float: discrete inputs promote to the SMALLEST
    # float that can hold them (int8/uint8/bool -> float32, int32+ -> float64)
    up = upcast(*dtypes)
    base = np.dtype(up if up != "bfloat16" else "float32")
    if base.kind in ("i", "u", "b"):
        return str(np.promote_types(base, np.float32))
    return up


def _true_div_dtype(a, b):
    # reference semantics (scalar/basic.py TrueDiv): integer / integer
    # divides at floatX, not numpy's float64
    up = upcast(a, b)
    if np.dtype(up if up != "bfloat16" else "float32").kind in ("i", "u", "b"):
        return config.floatX
    return upcast_float(a, b)


true_div = _op("true_div", 2, np.true_divide, lambda a, b: _jnp().true_divide(a, b),
               _true_div_grad, dtype_rule=_true_div_dtype)

int_div = _op(
    "int_div", 2, np.floor_divide, lambda a, b: _jnp().floor_divide(a, b),
    lambda i, o, gz: [_zero_like(i[0]), _zero_like(i[1])],
)


def _mod_grad(i, o, gz):
    # d(x mod y)/dx = 1 ; d/dy = -floor(x/y)
    tm = _tm()
    return [gz[0], -gz[0] * tm.floor(i[0] / i[1])]


mod = _op("mod", 2, np.mod, lambda a, b: _jnp().mod(a, b), _mod_grad)


def _pow_grad(i, o, gz):
    tm = _tm()
    x, y = i
    gx = gz[0] * y * x ** (y - 1)
    gy = gz[0] * o[0] * tm.log(x)
    return [gx, gy]


pow = _op("pow", 2, np.power, lambda a, b: _jnp().power(a, b), _pow_grad)

neg = _op("neg", 1, np.negative, lambda a: _jnp().negative(a), lambda i, o, gz: [-gz[0]])


def _abs_grad(i, o, gz):
    return [gz[0] * _tm().sign(i[0])]


abs = _op("abs", 1, np.abs, lambda a: _jnp().abs(a), _abs_grad)
sign = _op("sign", 1, np.sign, lambda a: _jnp().sign(a),
           lambda i, o, gz: [_zero_like(i[0])])
ceil = _op("ceil", 1, np.ceil, lambda a: _jnp().ceil(a),
           lambda i, o, gz: [_zero_like(i[0])], dtype_rule=_upgrade_to_float)
floor = _op("floor", 1, np.floor, lambda a: _jnp().floor(a),
            lambda i, o, gz: [_zero_like(i[0])], dtype_rule=_upgrade_to_float)
trunc = _op("trunc", 1, np.trunc, lambda a: _jnp().trunc(a),
            lambda i, o, gz: [_zero_like(i[0])], dtype_rule=_upgrade_to_float)
round_half_to_even = _op("round_half_to_even", 1, np.round, lambda a: _jnp().round(a),
                         lambda i, o, gz: [_zero_like(i[0])])
round_half_away_from_zero = _op(
    # reference RoundHalfAwayFromZero (scalar/basic.py round_half_away_
    # from_zero_vec): round(2.5) == 3, not numpy's banker's rounding.
    # sign-based (not copysign): jnp.copysign lowers to a signbit
    # bitcast that TPU's x64 rewriter rejects for f64
    "round_half_away_from_zero", 1,
    lambda a: np.copysign(np.floor(np.abs(a) + 0.5), a),
    lambda a: _jnp().where(a < 0, -_jnp().floor(_jnp().abs(a) + 0.5),
                           _jnp().floor(_jnp().abs(a) + 0.5)),
    lambda i, o, gz: [_zero_like(i[0])])
sqr = _op("sqr", 1, np.square, lambda a: _jnp().square(a),
          lambda i, o, gz: [gz[0] * 2 * i[0]])
sqrt = _op("sqrt", 1, np.sqrt, lambda a: _jnp().sqrt(a),
           lambda i, o, gz: [gz[0] / (2 * o[0])], dtype_rule="float")
reciprocal = _op("reciprocal", 1, np.reciprocal, lambda a: _jnp().reciprocal(a),
                 lambda i, o, gz: [-gz[0] * o[0] * o[0]], dtype_rule="float")
exp = _op("exp", 1, np.exp, lambda a: _jnp().exp(a),
          lambda i, o, gz: [gz[0] * o[0]], dtype_rule="float")
exp2 = _op("exp2", 1, np.exp2, lambda a: _jnp().exp2(a),
           lambda i, o, gz: [gz[0] * o[0] * float(np.log(2))], dtype_rule="float")
expm1 = _op("expm1", 1, np.expm1, lambda a: _jnp().expm1(a),
            lambda i, o, gz: [gz[0] * _tm().exp(i[0])], dtype_rule="float")
log = _op("log", 1, np.log, lambda a: _jnp().log(a),
          lambda i, o, gz: [gz[0] / i[0]], dtype_rule="float")
log2 = _op("log2", 1, np.log2, lambda a: _jnp().log2(a),
           lambda i, o, gz: [gz[0] / (i[0] * float(np.log(2)))], dtype_rule="float")
log10 = _op("log10", 1, np.log10, lambda a: _jnp().log10(a),
            lambda i, o, gz: [gz[0] / (i[0] * float(np.log(10)))], dtype_rule="float")
log1p = _op("log1p", 1, np.log1p, lambda a: _jnp().log1p(a),
            lambda i, o, gz: [gz[0] / (1 + i[0])], dtype_rule="float")
deg2rad = _op("deg2rad", 1, np.deg2rad, lambda a: _jnp().deg2rad(a),
              lambda i, o, gz: [gz[0] * float(np.pi / 180)], dtype_rule="float")
rad2deg = _op("rad2deg", 1, np.rad2deg, lambda a: _jnp().rad2deg(a),
              lambda i, o, gz: [gz[0] * float(180 / np.pi)], dtype_rule="float")

# trig
sin = _op("sin", 1, np.sin, lambda a: _jnp().sin(a),
          lambda i, o, gz: [gz[0] * _tm().cos(i[0])], dtype_rule="float")
cos = _op("cos", 1, np.cos, lambda a: _jnp().cos(a),
          lambda i, o, gz: [-gz[0] * _tm().sin(i[0])], dtype_rule="float")
tan = _op("tan", 1, np.tan, lambda a: _jnp().tan(a),
          lambda i, o, gz: [gz[0] * (1 + o[0] * o[0])], dtype_rule="float")
arcsin = _op("arcsin", 1, np.arcsin, lambda a: _jnp().arcsin(a),
             lambda i, o, gz: [gz[0] / _tm().sqrt(1 - i[0] * i[0])], dtype_rule="float")
arccos = _op("arccos", 1, np.arccos, lambda a: _jnp().arccos(a),
             lambda i, o, gz: [-gz[0] / _tm().sqrt(1 - i[0] * i[0])], dtype_rule="float")
arctan = _op("arctan", 1, np.arctan, lambda a: _jnp().arctan(a),
             lambda i, o, gz: [gz[0] / (1 + i[0] * i[0])], dtype_rule="float")


def _arctan2_grad(i, o, gz):
    y, x = i
    denom = x * x + y * y
    return [gz[0] * x / denom, -gz[0] * y / denom]


arctan2 = _op("arctan2", 2, np.arctan2, lambda a, b: _jnp().arctan2(a, b),
              _arctan2_grad, dtype_rule="float")
sinh = _op("sinh", 1, np.sinh, lambda a: _jnp().sinh(a),
           lambda i, o, gz: [gz[0] * _tm().cosh(i[0])], dtype_rule="float")
cosh = _op("cosh", 1, np.cosh, lambda a: _jnp().cosh(a),
           lambda i, o, gz: [gz[0] * _tm().sinh(i[0])], dtype_rule="float")
tanh = _op("tanh", 1, np.tanh, lambda a: _jnp().tanh(a),
           lambda i, o, gz: [gz[0] * (1 - o[0] * o[0])], dtype_rule="float")
arcsinh = _op("arcsinh", 1, np.arcsinh, lambda a: _jnp().arcsinh(a),
              lambda i, o, gz: [gz[0] / _tm().sqrt(i[0] * i[0] + 1)], dtype_rule="float")
arccosh = _op("arccosh", 1, np.arccosh, lambda a: _jnp().arccosh(a),
              lambda i, o, gz: [gz[0] / _tm().sqrt(i[0] * i[0] - 1)], dtype_rule="float")
arctanh = _op("arctanh", 1, np.arctanh, lambda a: _jnp().arctanh(a),
              lambda i, o, gz: [gz[0] / (1 - i[0] * i[0])], dtype_rule="float")

# comparisons -> bool
lt = _op("lt", 2, np.less, lambda a, b: _jnp().less(a, b),
         lambda i, o, gz: [_zero_like(i[0]), _zero_like(i[1])], dtype_rule="bool")
gt = _op("gt", 2, np.greater, lambda a, b: _jnp().greater(a, b),
         lambda i, o, gz: [_zero_like(i[0]), _zero_like(i[1])], dtype_rule="bool")
le = _op("le", 2, np.less_equal, lambda a, b: _jnp().less_equal(a, b),
         lambda i, o, gz: [_zero_like(i[0]), _zero_like(i[1])], dtype_rule="bool")
ge = _op("ge", 2, np.greater_equal, lambda a, b: _jnp().greater_equal(a, b),
         lambda i, o, gz: [_zero_like(i[0]), _zero_like(i[1])], dtype_rule="bool")
eq = _op("eq", 2, np.equal, lambda a, b: _jnp().equal(a, b),
         lambda i, o, gz: [_zero_like(i[0]), _zero_like(i[1])], dtype_rule="bool",
         commutative=True)
neq = _op("neq", 2, np.not_equal, lambda a, b: _jnp().not_equal(a, b),
          lambda i, o, gz: [_zero_like(i[0]), _zero_like(i[1])], dtype_rule="bool",
          commutative=True)
isnan = _op("isnan", 1, np.isnan, lambda a: _jnp().isnan(a),
            lambda i, o, gz: [_zero_like(i[0])], dtype_rule="bool")
isinf = _op("isinf", 1, np.isinf, lambda a: _jnp().isinf(a),
            lambda i, o, gz: [_zero_like(i[0])], dtype_rule="bool")


def _maximum_grad(i, o, gz):
    tm = _tm()
    x, y = i
    gx = gz[0] * tm.cast(tm.ge(x, y), gz[0].dtype)
    gy = gz[0] * tm.cast(tm.lt(x, y), gz[0].dtype)
    return [gx, gy]


def _minimum_grad(i, o, gz):
    tm = _tm()
    x, y = i
    gx = gz[0] * tm.cast(tm.le(x, y), gz[0].dtype)
    gy = gz[0] * tm.cast(tm.gt(x, y), gz[0].dtype)
    return [gx, gy]


maximum = _op("maximum", 2, np.maximum, lambda a, b: _jnp().maximum(a, b),
              _maximum_grad, commutative=True)
minimum = _op("minimum", 2, np.minimum, lambda a, b: _jnp().minimum(a, b),
              _minimum_grad, commutative=True)

def _int_only(opname):
    def rule(*dts):
        for dt in dts:
            if str(dt).startswith(("float", "complex")):
                raise TypeError(
                    f"{opname} does not accept {dt} operands "
                    "(numpy bitwise semantics)")
        return upcast(*dts)
    return rule


# logical / bitwise
and_ = _op("and_", 2, np.bitwise_and, lambda a, b: _jnp().bitwise_and(a, b),
           lambda i, o, gz: [_zero_like(i[0]), _zero_like(i[1])],
           identity="except_bool_one", commutative=True,
           dtype_rule=_int_only("bitwise_and"))
or_ = _op("or_", 2, np.bitwise_or, lambda a, b: _jnp().bitwise_or(a, b),
          lambda i, o, gz: [_zero_like(i[0]), _zero_like(i[1])],
          identity=0, commutative=True, dtype_rule=_int_only("bitwise_or"))
xor = _op("xor", 2, np.bitwise_xor, lambda a, b: _jnp().bitwise_xor(a, b),
          lambda i, o, gz: [_zero_like(i[0]), _zero_like(i[1])],
          identity=0, commutative=True, dtype_rule=_int_only("bitwise_xor"))
invert = _op("invert", 1, np.invert, lambda a: _jnp().invert(a),
             lambda i, o, gz: [_zero_like(i[0])],
             dtype_rule=_int_only("invert"))
left_shift = _op("left_shift", 2, np.left_shift, lambda a, b: _jnp().left_shift(a, b))
right_shift = _op("right_shift", 2, np.right_shift, lambda a, b: _jnp().right_shift(a, b))

# control
def _switch_grad(i, o, gz):
    # switch (not mul-by-cast) so the guarded branch's gradient is never
    # *evaluated into* the other region: switch(c, gz, 0) composes with the
    # mul/div switch-sink rewrites to keep 0*inf NaNs out of guarded logps
    # (reference rewriting/math.py local_mul_switch_sink rationale)
    tm = _tm()
    c, t, f = i
    zero = _zero_like(c)
    gz0 = gz[0]
    zval = _zero_like(gz0)
    gt_ = tm.switch(c, gz0, zval)
    gf_ = tm.switch(c, zval, gz0)
    return [zero, gt_, gf_]


switch = _op(
    "switch", 3, lambda c, t, f: np.where(c, t, f),
    lambda c, t, f: _jnp().where(c, t, f),
    _switch_grad,
    dtype_rule=lambda c, t, f: upcast(t, f),
)


def _clip_grad(i, o, gz):
    tm = _tm()
    x, lo, hi = i
    inside = tm.and_(tm.ge(x, lo), tm.le(x, hi))
    gx = gz[0] * tm.cast(inside, gz[0].dtype)
    glo = gz[0] * tm.cast(tm.lt(x, lo), gz[0].dtype)
    ghi = gz[0] * tm.cast(tm.gt(x, hi), gz[0].dtype)
    return [gx, glo, ghi]


def _np_clip(x, lo, hi):
    # NOT np.clip: when lo > hi the reference returns lo (its C impl
    # checks the min bound first, scalar/basic.py Clip.impl), np.clip
    # returns hi.  The pullback below is only consistent with this form.
    return np.where(x < lo, lo, np.where(x > hi, hi, x))


def _jax_clip(x, lo, hi):
    jnp = _jnp()
    return jnp.where(x < lo, lo, jnp.where(x > hi, hi, x))


clip = _op("clip", 3, _np_clip, _jax_clip, _clip_grad,
           dtype_rule=lambda x, lo, hi: upcast(x, lo, hi))


def _second_grad(i, o, gz):
    from pytensor_tpu.gradient import DisconnectedType

    return [DisconnectedType()(), gz[0]]


# second(a, b) = broadcast b to the shape of the pair — the "fill" primitive
second = _op(
    "second", 2,
    lambda a, b: np.broadcast_arrays(a, b)[1].copy(),
    lambda a, b: _jnp().broadcast_to(b, _jnp().broadcast_shapes(_jnp().shape(a), _jnp().shape(b))),
    _second_grad,
    dtype_rule=lambda a, b: str(b),
)

identity = _op("identity", 1, lambda a: a, lambda a: a, lambda i, o, gz: [gz[0]],
               dtype_rule="first")

# casts: one op per target dtype
_cast_ops: dict[str, ScalarOp] = {}


def cast_op(dtype: str) -> ScalarOp:
    from pytensor_tpu.tensor.type import _np_dtype

    dtype = str(dtype)
    if dtype not in _cast_ops:
        npdt = _np_dtype(dtype)

        def _cast_grad(i, o, gz, _dtype=dtype):
            tm = _tm()
            if _is_discrete(i[0]) or _is_discrete(o[0]):
                # float -> int is piecewise constant: zero gradient
                # (reference Cast.grad semantics), not identity
                return [_zero_like(i[0])]
            return [tm.cast(gz[0], i[0].dtype)]

        _cast_ops[dtype] = _op(
            f"cast{{{dtype}}}", 1,
            lambda a, npdt=npdt: np.asarray(a).astype(npdt),
            lambda a, dtype=dtype: _jnp().asarray(a).astype(dtype),
            _cast_grad,
            dtype_rule=lambda a, dtype=dtype: dtype,
        )
    return _cast_ops[dtype]


# complex
real = _op("real", 1, np.real, lambda a: _jnp().real(a),
           dtype_rule=lambda a: str(np.empty(0, dtype=a).real.dtype) if a in ("complex64", "complex128") else a)
imag = _op("imag", 1, np.imag, lambda a: _jnp().imag(a),
           dtype_rule=lambda a: str(np.empty(0, dtype=a).real.dtype) if a in ("complex64", "complex128") else a)
angle = _op("angle", 1, np.angle, lambda a: _jnp().angle(a), dtype_rule="float")
conj = _op("conj", 1, np.conj, lambda a: _jnp().conj(a), lambda i, o, gz: [_tm().conj(gz[0])],
           dtype_rule="first")
complex_op = _op("complex", 2, lambda re, im: re + 1j * im,
                 lambda re, im: _jnp().asarray(re) + 1j * _jnp().asarray(im),
                 dtype_rule=lambda a, b: "complex128" if upcast(a, b) == "float64" else "complex64")
