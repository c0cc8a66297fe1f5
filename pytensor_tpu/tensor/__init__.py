"""pytensor_tpu.tensor: the tensor op library (import as ``pt``)."""

from pytensor_tpu.tensor.type import *  # noqa: F401,F403
from pytensor_tpu.tensor.type import TensorType  # noqa: F401
from pytensor_tpu.tensor.variable import TensorConstant, TensorVariable  # noqa: F401
from pytensor_tpu.tensor.basic import *  # noqa: F401,F403
from pytensor_tpu.tensor.basic import (  # noqa: F401
    alloc,
    meshgrid,
    mgrid,
    ogrid,
    arange,
    as_tensor_variable,
    as_tensor,
    cast,
    concatenate,
    constant,
    diag,
    diagonal,
    expand_dims,
    eye,
    fill,
    full,
    full_like,
    get_scalar_constant_value,
    identity_like,
    join,
    moveaxis,
    ones,
    ones_like,
    shape_padaxis,
    shape_padleft,
    shape_padright,
    split,
    stack,
    swapaxes,
    tile,
    transpose,
    tri,
    tril,
    triu,
    where,
    zeros,
    zeros_like,
)
from pytensor_tpu.tensor.reshape import join_dims, split_dims  # noqa: F401
from pytensor_tpu.tensor.functional import (  # noqa: F401
    atleast_3d,
    broadcast_shape,
    ceil_intdiv,
    fill_diagonal_offset,
    get_vector_length,
    inverse_permutation,
    iround,
    is_flat,
    isfinite,
    isneginf,
    isposinf,
    median,
    nan_to_num,
    roll,
    round_half_away_from_zero,
    slice_at_axis,
    stacklists,
    tril_indices,
    tril_indices_from,
    triu_indices,
    triu_indices_from,
    vectorize,
)
from pytensor_tpu.tensor.interpolate import interp, interpolate1d  # noqa: F401
from pytensor_tpu.tensor.type_other import (  # noqa: F401
    MakeSlice,
    NoneConst,
    make_slice,
)

# aliases + re-exports for remaining reference names
from pytensor_tpu.tensor.extra_ops import (  # noqa: F401
    compress,
    ravel_multi_index,
    unravel_index,
)
from pytensor_tpu.tensor.math import conj as conjugate  # noqa: F401
from pytensor_tpu.tensor.math import sign as sgn  # noqa: F401
from pytensor_tpu.tensor.basic import diagonal as extract_diag  # noqa: F401
from pytensor_tpu.gradient import grad, hessian, jacobian  # noqa: F401
from pytensor_tpu.compile.ops import view_op as tensor_copy  # noqa: F401

identity = tensor_copy
TensorLike = object  # typing alias (reference: Union[Variable, np types])


def tensor_from_scalar(x):
    """0-d scalars ARE tensors here; kept for API parity."""
    return as_tensor_variable(x)


def scalar_from_tensor(x):
    x = as_tensor_variable(x)
    if x.type.ndim != 0:
        raise TypeError("scalar_from_tensor expects a 0-d tensor")
    return x


def complex_from_polar(abs_, angle):
    from pytensor_tpu.tensor import math as _m

    re = abs_ * _m.cos(angle)
    im = abs_ * _m.sin(angle)
    return cast(re, "complex128") + cast(as_tensor_variable(1j), "complex128") * cast(im, "complex128")


def concat_with_broadcast(tensor_list, axis=0):
    """Concatenate after broadcasting all non-axis dims to a common shape
    (reference tensor/basic.py concat_with_broadcast)."""
    from pytensor_tpu.tensor.extra_ops import broadcast_arrays

    tensor_list = [as_tensor_variable(t) for t in tensor_list]
    ndim = tensor_list[0].type.ndim
    if axis < 0:
        axis += ndim
    # broadcast every non-axis dim: probe via zero-sums of slices
    probes = []
    for t in tensor_list:
        idx = [slice(None)] * ndim
        idx[axis] = slice(0, 1)
        probes.append(t[tuple(idx)] * 0)
    common = probes[0]
    for p in probes[1:]:
        common = common + p
    bcast = []
    for t in tensor_list:
        bcast.append(t + cast(common, t.type.dtype))
    return concatenate(bcast, axis=axis)


def pack(*xs):
    """Flatten + concatenate into one vector (reference pack)."""
    return concatenate([as_tensor_variable(x).flatten() for x in xs])


def unpack(vec, shapes):
    """Inverse of pack for statically-known shapes."""
    import numpy as _np2

    out = []
    pos = 0
    for shp in shapes:
        size = int(_np2.prod(shp)) if shp else 1
        chunk = vec[pos: pos + size]
        out.append(chunk.reshape(shp) if shp else chunk[0])
        pos += size
    return out


def imatrices(*names):
    return [imatrix(n) for n in names]


def lmatrices(*names):
    return [lmatrix(n) for n in names]


def geomspace(start, stop, num=50, base=10.0, dtype=None):
    import numpy as _np3

    from pytensor_tpu.tensor import math as _m
    from pytensor_tpu.tensor.extra_ops import linspace as _linspace

    start = as_tensor_variable(start)
    stop = as_tensor_variable(stop)
    lin = _linspace(_m.log(start) / float(_np3.log(base)),
                    _m.log(stop) / float(_np3.log(base)), num)
    out = as_tensor_variable(float(base)) ** lin
    return cast(out, dtype) if dtype is not None else out


# numeric constants (reference tensor namespace)
import numpy as _np

pi = _np.pi
e = _np.e
euler_gamma = _np.euler_gamma
inf = _np.inf
nan = _np.nan
newaxis = None

from pytensor_tpu.tensor.math import *  # noqa: F401,F403
from pytensor_tpu.tensor import math  # noqa: F401
from pytensor_tpu.tensor.math import (  # noqa: F401
    abs,
    add,
    all,
    any,
    argmax,
    argmin,
    cos,
    dot,
    eq,
    exp,
    ge,
    gt,
    le,
    log,
    lt,
    matmul,
    max,
    maximum,
    mean,
    min,
    minimum,
    mul,
    neq,
    outer,
    pow,
    prod,
    sigmoid,
    sin,
    softplus,
    sqr,
    sqrt,
    std,
    sub,
    sum,
    switch,
    tanh,
    tensordot,
    true_div,
    var,
)
from pytensor_tpu.tensor.shape import (  # noqa: F401
    Reshape,
    Shape,
    Shape_i,
    SpecifyShape,
    flatten,
    reshape,
    shape,
    shape_tuple,
    specify_broadcastable,
    specify_shape,
    unbroadcast,
)
from pytensor_tpu.tensor.subtensor import (  # noqa: F401
    AdvancedIncSubtensor,
    AdvancedIncSubtensor1,
    AdvancedSubtensor,
    AdvancedSubtensor1,
    IncSubtensor,
    Subtensor,
    flip,
    inc_subtensor,
    set_subtensor,
    take,
    take_along_axis,
)
from pytensor_tpu.tensor.elemwise import CAReduce, DimShuffle, Elemwise  # noqa: F401
from pytensor_tpu.tensor import extra_ops  # noqa: F401
from pytensor_tpu.tensor.extra_ops import (  # noqa: F401
    bartlett,
    bincount,
    broadcast_arrays,
    broadcast_to,
    cumprod,
    cumsum,
    diff,
    fill_diagonal,
    linspace,
    logspace,
    repeat,
    searchsorted,
    squeeze,
    unique,
)
from pytensor_tpu.tensor.sort import argsort, sort, topk  # noqa: F401
from pytensor_tpu.tensor.sharedvar import TensorSharedVariable  # noqa: F401


# eager submodule imports with explicit function rebinds (a later submodule
# import would otherwise shadow same-named functions, e.g. pt.einsum)
import pytensor_tpu.tensor.blockwise  # noqa: E402,F401
from pytensor_tpu.tensor.blockwise import Blockwise  # noqa: E402,F401
import pytensor_tpu.tensor.linalg as linalg  # noqa: E402,F401
import pytensor_tpu.tensor.blas as blas  # noqa: E402,F401
from pytensor_tpu.tensor.blas import batched_dot  # noqa: E402,F401
import pytensor_tpu.tensor.special as special  # noqa: E402,F401
from pytensor_tpu.tensor.special import log_softmax, softmax  # noqa: E402,F401
from pytensor_tpu.tensor.einsum import einsum  # noqa: E402,F401
from pytensor_tpu.tensor.pad import pad  # noqa: E402,F401
import pytensor_tpu.tensor.fft as fft  # noqa: E402,F401
import pytensor_tpu.tensor.signal as signal  # noqa: E402,F401
from pytensor_tpu.tensor.signal import convolve1d, convolve2d  # noqa: E402,F401

# reference-compat aliases for the legacy linalg namespaces
slinalg = linalg
nlinalg = linalg


def __getattr__(name):
    if name == "random":
        import pytensor_tpu.tensor.random as random

        return random
    if name == "optimize":
        import pytensor_tpu.tensor.optimize as optimize

        return optimize
    raise AttributeError(f"module pytensor_tpu.tensor has no attribute {name}")
import pytensor_tpu.tensor.fused  # noqa: E402,F401

# reference-namespace module aliases and leftovers
import pytensor_tpu.tensor.optimize as optimize  # noqa: F401
import pytensor_tpu.tensor.type_other as slicetype  # noqa: F401
import pytensor_tpu.tensor.type_other as none_type_t_module  # noqa: F401
from pytensor_tpu.tensor.type_other import NoneConst, none_type_t  # noqa: F401

NoneSliceConst = NoneConst  # reference tensor/__init__.py:4 name


def values_eq_approx_always_true(a, b):
    """Comparator that accepts anything (reference tensor/type.py:728;
    used to silence DebugMode on intentionally-nondeterministic ops)."""
    return True

from pytensor_tpu.tensor import exceptions, transfer, utils  # noqa: F401,E402
from pytensor_tpu.tensor import type_other as symbolic  # noqa: F401,E402
from pytensor_tpu.tensor import random  # noqa: F401,E402
