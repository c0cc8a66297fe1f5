"""pytensor_tpu: a TPU-native expression compiler.

A ground-up rebuild of PyTensor's capabilities (define / rewrite / compile
mathematical expression graphs, the computational backend of PyMC) where
the only production backend is XLA: graphs lower to StableHLO via jax,
fused hot paths can emit Pallas kernels, matmuls ride the MXU, shared
variable updates ride buffer donation, and multi-chip scaling rides
jax.sharding meshes (see `parallel`).

Public API parallels the reference top level
(/root/reference/pytensor/__init__.py:18-38): function, grad/Lop/Rop,
shared, scan, ifelse, OpFromGraph, config, dprint.
"""

from pytensor_tpu.config import config  # noqa: F401

__version__ = "0.1.0"

from pytensor_tpu.graph.basic import Apply, Constant, Variable  # noqa: F401
from pytensor_tpu.graph.op import Op  # noqa: F401
from pytensor_tpu.graph.fg import FunctionGraph  # noqa: F401
from pytensor_tpu.graph.replace import clone_replace, graph_replace, vectorize_graph  # noqa: F401
from pytensor_tpu.compile.maker import function  # noqa: F401
from pytensor_tpu.compile.sharedvalue import shared  # noqa: F401
from pytensor_tpu.compile.io import In, Out  # noqa: F401
from pytensor_tpu.compile.mode import FAST_COMPILE, FAST_RUN, Mode, get_mode  # noqa: F401
from pytensor_tpu.gradient import (  # noqa: F401
    Lop,
    Rop,
    grad,
    hessian,
    jacobian,
    pullback,
    pushforward,
    verify_grad,
)
from pytensor_tpu.printing import debugprint, dprint, pp, pprint, pydotprint  # noqa: F401
from pytensor_tpu.updates import OrderedUpdates  # noqa: F401

import pytensor_tpu.tensor as tensor  # noqa: F401

# rewrite packs register into optdb at import time
import pytensor_tpu.tensor.rewriting  # noqa: F401
import pytensor_tpu.assumptions  # noqa: F401  (assumption-driven rewrites)

# bind the scan *function* after the subpackage import so the name refers
# to the callable (the reference does the same for pytensor.scan)
from pytensor_tpu.scan.basic import scan  # noqa: E402,F401
from pytensor_tpu.scan.views import foldl, foldr  # noqa: E402,F401
from pytensor_tpu.scan.views import map as scan_map  # noqa: E402,F401
from pytensor_tpu.scan.views import reduce as scan_reduce  # noqa: E402,F401
from pytensor_tpu.scan.checkpoints import scan_checkpoints  # noqa: E402,F401

map = scan_map
reduce = scan_reduce


# import the submodule eagerly, then rebind the name to the callable —
# a later `from pytensor_tpu.ifelse import ...` must not shadow it back
# to the module (the import system only sets the parent attr on the
# submodule's FIRST load)
import pytensor_tpu.ifelse as _ifelse_module  # noqa: E402
from pytensor_tpu.ifelse import ifelse  # noqa: E402,F401


def __getattr__(name):
    if name == "wrap_py":
        from pytensor_tpu.compile.ops import wrap_py

        return wrap_py
    if name == "misc":
        import pytensor_tpu.misc as misc

        return misc
    if name == "OpFromGraph":
        from pytensor_tpu.compile.builders import OpFromGraph

        return OpFromGraph
    if name == "sparse":
        import pytensor_tpu.sparse as sparse

        return sparse
    if name == "xtensor":
        import pytensor_tpu.xtensor as xtensor

        return xtensor
    if name == "parallel":
        import pytensor_tpu.parallel as parallel

        return parallel
    if name == "breakpoint":
        import pytensor_tpu.breakpoint as breakpoint

        return breakpoint
    raise AttributeError(f"module pytensor_tpu has no attribute {name}")


def get_underlying_scalar_constant(v):
    from pytensor_tpu.tensor.basic import get_scalar_constant_value

    return get_scalar_constant_value(v)
from pytensor_tpu.link.xla.ops import JAXOp, wrap_jax  # noqa: E402,F401
from pytensor_tpu.basic_symbolic import as_symbolic  # noqa: E402,F401
from pytensor_tpu.compile.builders import OpFromGraph  # noqa: E402,F401
from pytensor_tpu.compile.ops import wrap_py  # noqa: E402,F401
from pytensor_tpu.compile.train import train_loop  # noqa: E402,F401
import pytensor_tpu.basic_symbolic as basic  # noqa: E402,F401  (ref pytensor.basic)
import pytensor_tpu.misc as misc  # noqa: E402,F401
import pytensor_tpu.config as configdefaults  # noqa: E402,F401  (ref module-name compat)
import pytensor_tpu.config as configparser  # noqa: E402,F401
