"""Reference scalar-namespace compatibility surface.

Design note (PARITY.md): this framework has no separate scalar graph
level — scalars ARE 0-d tensors, and built-in kernels are instance
descriptors (`scalar/basic.py` ScalarOp).  This module provides the
reference's user-facing scalar API on top of that design
(/root/reference/pytensor/scalar/basic.py):

- the scalar *type* objects (``int8`` ... ``complex128``) as callable
  0-d TensorType instances (``ScalarType`` is TensorType here);
- the ``NumpyAutocaster`` literal-casting machinery with the
  ``autocast_float_as`` context manager, consumed by
  ``tensor.as_tensor_variable`` for python int/float literals;
- the output-type-preference callables (``upgrade_to_float``,
  ``upcast_out``, ``same_out``, ...; reference scalar/basic.py:1023-1140);
- ``UnaryScalarOp`` / ``BinaryScalarOp`` base classes so downstream code
  (PyMC defines custom scalar ops this way) can subclass, override
  ``impl``/``grad``/``L_op``, and get a working op: the numpy ``impl``
  is the oracle AND (through ``jax.pure_callback``) the default XLA
  lowering; override ``jax_impl`` for a native lowering.

C-codegen plumbing (c_code, amdlibm hooks) intentionally has no analog.
"""

from __future__ import annotations

import builtins

import numpy as np

from pytensor_tpu.config import config
from pytensor_tpu.scalar.basic import (  # noqa: F401
    ScalarOp,
    int_div as floor_div,
    maximum as scalar_maximum,
    minimum as scalar_minimum,
    abs as scalar_abs,
    upcast,
    upcast_float,
)


# --- scalar types: 0-d TensorTypes -----------------------------------------

def _TT():
    from pytensor_tpu.tensor.type import TensorType

    return TensorType


def get_scalar_type(dtype, cache: dict = {}):
    """The 0-d TensorType for ``dtype`` (reference get_scalar_type:4102)."""
    key = str(dtype)
    t = cache.get(key)
    if t is None:
        t = cache[key] = _TT()(key, ())
    return t


def ScalarType(dtype, shape=(), name=None):
    """Scalars are 0-d tensors in this design: returns TensorType(dtype, ()).

    Kept callable with the reference's ``ScalarType(dtype)`` signature;
    ``isinstance(t, ScalarType)`` checks should use TensorType + ndim==0.
    """
    return _TT()(dtype, ())


class _LazyScalarTypes:
    # module attributes int8...complex128 must be *instances* (callable to
    # make a variable, usable as dict keys / in comparisons), but TensorType
    # imports tensor.* which imports scalar.* — resolve lazily via
    # module-level __getattr__ below.
    DTYPES = (
        "bool", "int8", "int16", "int32", "int64",
        "uint8", "uint16", "uint32", "uint64",
        "float16", "float32", "float64", "bfloat16",
        "complex64", "complex128",
    )




int_types = ("int8", "int16", "int32", "int64")
uint_types = ("uint8", "uint16", "uint32", "uint64")
integer_types = int_types + uint_types
float_types = ("float16", "float32", "float64")
complex_types = ("complex64", "complex128")
discrete_types = integer_types + ("bool",)
continuous_types = float_types + complex_types
all_types = discrete_types + continuous_types
discrete_dtypes = discrete_types


def _dtype_of(t) -> str:
    """Accept a type object, dtype object, or dtype string."""
    d = getattr(t, "dtype", t)
    return str(d)


def as_scalar(x, name=None):
    from pytensor_tpu.tensor.basic import as_tensor_variable

    v = as_tensor_variable(x, name=name)
    if v.type.ndim != 0:
        raise TypeError("as_scalar expects a 0-d value")
    return v


def constant(value, dtype=None):
    from pytensor_tpu.tensor.basic import constant as t_constant

    return t_constant(np.asarray(value, dtype=dtype))


def cast(x, dtype):
    from pytensor_tpu.tensor.basic import cast as t_cast

    return t_cast(as_scalar(x), dtype)


# --- literal autocasting (reference NumpyAutocaster:94) --------------------

class NumpyAutocaster:
    """Cast python ints/floats to numpy values per ``config.cast_policy``.

    'custom' (default): the first dtype of ``self.dtypes`` that represents
    the value without precision loss wins (float literals downcast to
    floatX directly when floatX != float64); 'numpy+floatX': numpy's own
    choice, except python floats become floatX.
    """

    def __init__(self, dtypes):
        self.dtypes = tuple(dtypes)

    def __call__(self, x):
        assert isinstance(x, (int, builtins.float)) or (
            isinstance(x, np.ndarray) and x.ndim == 0
        )
        if config.cast_policy == "numpy":
            return np.asarray(x)
        if config.cast_policy == "numpy+floatX":
            rval = np.asarray(x)
            if (not hasattr(x, "dtype")
                    and rval.dtype in ("float64", "float32")
                    and rval.dtype != config.floatX):
                rval = rval.astype(config.floatX)
            return rval

        # 'custom'
        try:
            if str(x.dtype) in self.dtypes:
                return np.asarray(x)
        except AttributeError:
            pass
        if (isinstance(x, builtins.float)
                and config.floatX in self.dtypes
                and config.floatX != "float64"):
            return np.asarray(x, dtype=config.floatX)
        # don't autocast to float16 unless floatX is float16
        try_dtypes = [d for d in self.dtypes
                      if config.floatX == "float16" or d != "float16"]
        x_ = np.asarray(x)
        for dtype in try_dtypes:
            cand = np.asarray(x).astype(dtype=dtype)
            if np.array_equal(np.asarray(x), cand):
                return cand
            last = cand
        if isinstance(x, builtins.int):
            # no listed int dtype represents the value exactly (e.g.
            # 2**63): keep numpy's own choice instead of silently
            # wrapping around
            return x_
        # floats: documented lossy downcast to the last listed dtype
        # (reference NumpyAutocaster "the last data type ... will be used")
        return last


autocast_int = NumpyAutocaster(int_types)
autocast_float = NumpyAutocaster(("float16", "float32", "float64"))


class autocast_float_as:
    """Temporarily change which dtypes float literals may autocast to
    (reference autocast_float_as:188).  'custom' cast policy only."""

    def __init__(self, *dtypes):
        self.dtypes = dtypes
        assert config.cast_policy == "custom"

    def __enter__(self):
        self.old_dtypes = autocast_float.dtypes
        autocast_float.dtypes = self.dtypes

    def __exit__(self, *args):
        autocast_float.dtypes = self.old_dtypes


def convert(x, dtype=None):
    """Convert a python/numpy value per the casting policy (reference
    convert:224)."""
    if dtype is not None:
        return np.asarray(x, dtype=dtype)
    if isinstance(x, (builtins.bool, np.bool_)):
        return np.asarray(x, dtype="bool")
    if isinstance(x, int):
        return autocast_int(x)
    if isinstance(x, builtins.float):
        return autocast_float(x)
    if isinstance(x, complex):
        return np.asarray(x, dtype="complex128")
    return np.asarray(x)


# --- output-type-preference callables (reference scalar/basic.py:1023) -----
# Accept type objects OR dtype strings; return a tuple of 0-d TensorTypes.

def upcast_out(*types):
    return (get_scalar_type(upcast(*map(_dtype_of, types))),)


def upcast_out_nobool(*types):
    out = upcast_out(*types)
    if _dtype_of(out[0]) == "bool":
        raise TypeError("bool output not supported")
    return out


def upcast_out_min8(*types):
    out = upcast_out(*types)
    if _dtype_of(out[0]) == "bool":
        return (get_scalar_type("int8"),)
    return out


def upgrade_to_float(*types):
    """Ints upgrade to float32/float64 so precision is not lost."""
    return (get_scalar_type(upcast_float(*map(_dtype_of, types))),)


def upgrade_to_float64(*types):
    return (get_scalar_type("float64"),)


def same_out(type):
    return (get_scalar_type(_dtype_of(type)),)


def same_out_nobool(type):
    if _dtype_of(type) == "bool":
        raise TypeError("bool input not supported")
    return same_out(type)


def same_out_min8(type):
    if _dtype_of(type) == "bool":
        return (get_scalar_type("int8"),)
    return same_out(type)


def upcast_out_no_complex(*types):
    if any(_dtype_of(t) in complex_types for t in types):
        raise TypeError("complex type are not supported")
    return upcast_out(*types)


def same_out_float_only(type):
    if _dtype_of(type) not in float_types:
        raise TypeError("only float type are supported")
    return same_out(type)


class specific_out:
    def __init__(self, *spec):
        self.spec = tuple(
            get_scalar_type(s) if isinstance(s, str) else s for s in spec
        )

    def __call__(self, *types):
        return self.spec


def int_out(*types):
    return (get_scalar_type("int64"),)


def float_out(*types):
    return (get_scalar_type("float64"),)


def upgrade_to_float_no_complex(*types):
    for t in types:
        if _dtype_of(t) in complex_types:
            raise TypeError("complex argument not supported")
    return upgrade_to_float(*types)


def same_out_nocomplex(type):
    if _dtype_of(type) in complex_types:
        raise TypeError("complex argument not supported")
    return same_out(type)


def real_out(type):
    d = _dtype_of(type)
    if d == "complex64":
        return (get_scalar_type("float32"),)
    if d == "complex128":
        return (get_scalar_type("float64"),)
    return same_out(type)


# --- exceptions / small helpers --------------------------------------------

class ComplexError(NotImplementedError):
    """Raised when a complex value is involved where unsupported."""


class IntegerDivisionError(Exception):
    """Raised when an integer division is part of an illegal operation."""


def mod_check(x, y):
    from pytensor_tpu.scalar import basic as sb

    if (_dtype_of(getattr(x, "type", x)) in complex_types
            or _dtype_of(getattr(y, "type", y)) in complex_types):
        raise ComplexError("Modulo is not implemented for complex types")
    return sb.mod(x, y)


def round_half_away_from_zero_(a):
    return np.copysign(np.floor(np.abs(a) + 0.5), a)


round_half_away_from_zero_vec = round_half_away_from_zero_


def apply_across_args(*fns):
    """Decorator-helper parity stub: reference uses it to broadcast
    constructor helpers over argument lists (scalar/basic.py:4200)."""

    def f(*names):
        if len(names) == 1:
            return fns[0](names[0])
        return [fn(name) for fn, name in zip(fns, names)]

    return f


# --- reference-style subclassable scalar ops --------------------------------

class _RefStyleScalarOp(ScalarOp):
    """Base for reference-signature custom scalar ops.

    Subclass, set/inherit ``nin``, override ``impl`` (numpy scalar math —
    the oracle), and optionally:
      - ``grad(self, inputs, output_grads)``  (reference signature), or
      - ``L_op(self, inputs, outputs, output_grads)``;
      - ``jax_impl(self, *args)`` for a native XLA lowering (otherwise the
        numpy ``impl`` runs on host via ``jax.pure_callback``).

    Construction matches the reference ScalarOp:1155:
    ``MyOp(output_types_preference, name=None)``.
    """

    nin = -1
    nout = 1
    commutative = False
    identity = None

    def __init__(self, output_types_preference=None, name=None):
        if output_types_preference is not None and not callable(
                output_types_preference):
            raise TypeError(
                "Expected a callable for the 'output_types_preference' "
                f"argument to {self.__class__} (got: "
                f"{output_types_preference})")
        self.output_types_preference = output_types_preference
        self.name = name or type(self).__name__

    # MetaObject identity: class + name + preference
    __props__ = ("name", "output_types_preference")

    def __reduce__(self):
        return (
            _rebuild_ref_style_op,
            (type(self), self.output_types_preference, self.name),
        )

    def output_dtype(self, *input_dtypes):
        pref = self.output_types_preference
        if pref is None:
            raise NotImplementedError(
                f"Cannot calculate the output types for {self}: no "
                "output_types_preference given")
        out = pref(*(get_scalar_type(d) for d in input_dtypes))
        if not isinstance(out, (list, tuple)) or len(out) != self.nout:
            raise TypeError(
                "output_types_preference should return a list or tuple "
                f"of {self.nout} type(s), got {out!r}")
        return _dtype_of(out[0])

    def impl(self, *args):
        raise NotImplementedError(
            f"{type(self).__name__} must override impl()")

    @property
    def np_fn(self):
        fn = self.__dict__.get("_np_fn")
        if fn is None:
            ufn = np.frompyfunc(self.impl, self.nin if self.nin >= 0 else 1,
                                self.nout)

            def fn(*args):
                out = ufn(*args)
                dt = self.output_dtype(*(str(np.asarray(a).dtype)
                                         for a in args))
                if self.nout == 1:
                    return np.asarray(out).astype(dt)
                return tuple(np.asarray(o).astype(dt) for o in out)

            self.__dict__["_np_fn"] = fn
        return fn

    @property
    def jax_fn(self):
        fn = self.__dict__.get("_jax_fn")
        if fn is None:
            if type(self).jax_impl is not _RefStyleScalarOp.jax_impl:
                fn = self.jax_impl
            else:
                np_fn = self.np_fn

                def fn(*args):
                    import jax

                    dt = self.output_dtype(
                        *(str(a.dtype) if hasattr(a, "dtype")
                          else str(np.asarray(a).dtype)
                          for a in args))
                    shape = np.broadcast_shapes(
                        *(np.shape(a) for a in args))
                    out_t = jax.ShapeDtypeStruct(shape, np.dtype(dt))

                    def _call(*a):
                        return np.asarray(np_fn(*a), dtype=dt)

                    return jax.pure_callback(_call, out_t, *args,
                                             vmap_method="broadcast_all")

            self.__dict__["_jax_fn"] = fn
        return fn

    def jax_impl(self, *args):
        raise NotImplementedError

    def L_op(self, inputs, outputs, output_grads):
        # reference chain: L_op defaults to grad(inputs, output_grads)
        return self.grad(inputs, output_grads)

    def grad(self, inputs, output_grads):
        from pytensor_tpu import gradient

        return [gradient.grad_not_implemented(self, i, inp)
                for i, inp in enumerate(inputs)]


def _rebuild_ref_style_op(cls, pref, name):
    return cls(pref, name)


class UnaryScalarOp(_RefStyleScalarOp):
    nin = 1


class BinaryScalarOp(_RefStyleScalarOp):
    nin = 2


# --- Composite (reference scalar/basic.py:4204) ----------------------------

class Composite:
    """Compatibility constructor for the reference's scalar Composite.

    In this design fusion products are ``tensor.fused.FusedElemwise``
    (OpFromGraph over the elementwise subgraph); a user-built Composite
    is represented directly by substitution: calling it splices the
    stored subgraph onto the arguments (equivalent to the reference's
    Composite after inlining).
    """

    def __init__(self, inputs, outputs, name="Composite"):
        self.inputs = list(inputs)
        self.outputs = list(outputs)
        self.name = name
        self.nin = len(self.inputs)
        self.nout = len(self.outputs)

    @property
    def fgraph(self):
        from pytensor_tpu.graph.fg import FunctionGraph

        return FunctionGraph(self.inputs, self.outputs, clone=True)

    def __call__(self, *args):
        from pytensor_tpu.graph.replace import clone_replace, vectorize_graph
        from pytensor_tpu.tensor.basic import as_tensor_variable

        if len(args) != self.nin:
            raise TypeError(
                f"{self.name} expected {self.nin} inputs, got {len(args)}")
        args = [as_tensor_variable(a) for a in args]
        repl = dict(zip(self.inputs, args))
        if any(a.type != i.type for a, i in zip(args, self.inputs)):
            # elementwise application to tensors: vectorize the scalar
            # subgraph over the arguments (reference applies Composite
            # through Elemwise; same broadcasting semantics)
            res = vectorize_graph(self.outputs, repl)
        else:
            res = clone_replace(self.outputs, replace=repl)
        return res[0] if self.nout == 1 else res

    def __str__(self):
        return self.name


# --- reference scalar.basic namespace completion ----------------------------
# Graph-level names the reference re-exports into its scalar namespace,
# plus the class surface downstream code dispatches on.

from pytensor_tpu.graph.basic import Apply, Constant, Variable  # noqa: E402,F401
from pytensor_tpu.graph.replace import clone_replace  # noqa: E402,F401
from pytensor_tpu.graph.traversal import applys_between  # noqa: E402,F401
from pytensor_tpu.graph.op import HasInnerGraph, Op  # noqa: E402,F401
from pytensor_tpu.graph.type import (  # noqa: E402,F401
    HasDataType,
    HasShape,
    Type as CType,  # C-codegen Type role; this build has one Type protocol
)
from pytensor_tpu.utils import difference, to_return_values  # noqa: E402,F401


class MethodNotDefined(Exception):
    """Raised by optional Op methods that a given op does not implement
    (reference link/c/interface.py; kept for except-clause compat)."""


class COp(Op):
    """Reference COp marker.  This build has no C codegen — ops lower
    through ``xla_funcify``; the class exists so downstream isinstance /
    subclass declarations keep working (perform() is the oracle)."""


class LogicalComparison(BinaryScalarOp):
    """Base for binary comparisons returning bool (reference
    scalar/basic.py LogicalComparison)."""

    nout = 1

    def __init__(self, output_types_preference=None, name=None):
        super().__init__(
            output_types_preference or specific_out("bool"), name=name)

    def output_dtype(self, *input_dtypes):
        return "bool"


class FixedLogicalComparison(UnaryScalarOp):
    """Base for unary predicates returning bool (reference
    scalar/basic.py FixedLogicalComparison)."""

    nout = 1

    def __init__(self, output_types_preference=None, name=None):
        super().__init__(
            output_types_preference or specific_out("bool"), name=name)

    def output_dtype(self, *input_dtypes):
        return "bool"


class UnaryBitOp(UnaryScalarOp):
    """Base for unary bitwise ops: integer/bool in, same type out."""

    def output_dtype(self, *input_dtypes):
        for d in input_dtypes:
            if d in continuous_types or d.startswith(("float", "complex")):
                raise TypeError(
                    f"{self.name} only works on integer or bool, got {d}")
        if self.output_types_preference is not None:
            return super().output_dtype(*input_dtypes)
        return input_dtypes[0]


class BinaryBitOp(BinaryScalarOp):
    """Base for binary bitwise ops: integer/bool in, upcast int out."""

    def output_dtype(self, *input_dtypes):
        for d in input_dtypes:
            if d.startswith(("float", "complex")):
                raise TypeError(
                    f"{self.name} only works on integer or bool, got {d}")
        if self.output_types_preference is not None:
            return super().output_dtype(*input_dtypes)
        return upcast(*input_dtypes)


def complex(name=None):
    """0-d complex128 variable ctor (reference scalar complex())."""
    return get_scalar_type("complex128")(name)


def _multi_ctor(dtype):
    def ctor(*names):
        vs = [get_scalar_type(dtype)(n) for n in names]
        return vs[0] if len(vs) == 1 else vs

    ctor.__name__ = dtype + "s"
    return ctor


floats = _multi_ctor("float64")
ints = _multi_ctor("int64")
complexs = _multi_ctor("complex128")
complexs64 = _multi_ctor("complex64")
complexs128 = _multi_ctor("complex128")


# lazy names that would pull tensor/gradient/printing in at import time
_LAZY_COMPAT = {
    "Cast", "ScalarVariable", "ScalarConstant", "ScalarConstantSignature",
    "ScalarInnerGraphOp", "pprint", "grad_undefined", "grad_not_implemented",
    "disconnected_type",
} | {f"convert_to_{d}" for d in (
    "bool", "int8", "int16", "int32", "int64",
    "uint8", "uint16", "uint32", "uint64",
    "float16", "float32", "float64", "complex64", "complex128")}


def __getattr__(name):
    if name in _LazyScalarTypes.DTYPES:
        t = get_scalar_type(name)
        globals()[name] = t
        return t
    if name not in _LAZY_COMPAT:
        raise AttributeError(
            f"module {__name__!r} has no attribute {name!r}")
    if name.startswith("convert_to_"):
        from pytensor_tpu.scalar.basic import cast_op

        return cast_op(name[len("convert_to_"):])
    if name == "Cast":
        # all cast kernels share one generated class (scalar/basic.py:191)
        from pytensor_tpu.scalar.basic import cast_op

        return type(cast_op("float64"))
    if name == "ScalarVariable":
        from pytensor_tpu.tensor.variable import TensorVariable

        return TensorVariable
    if name == "ScalarConstant":
        from pytensor_tpu.tensor.variable import TensorConstant

        return TensorConstant
    if name == "ScalarConstantSignature":
        # signatures here are plain (type, hash) tuples (graph/basic.py
        # Constant.signature); expose tuple for isinstance compat
        return tuple
    if name == "ScalarInnerGraphOp":
        from pytensor_tpu.scalar.loop import ScalarLoop

        return ScalarLoop.__mro__[0].__bases__ and ScalarLoop
    if name == "pprint":
        from pytensor_tpu.printing import pprint

        return pprint
    from pytensor_tpu import gradient as _g

    return getattr(_g, name)
