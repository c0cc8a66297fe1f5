from pytensor_tpu.compile.io import In, Out, SymbolicInput, SymbolicOutput
from pytensor_tpu.compile.mode import FAST_COMPILE, FAST_RUN, Mode, get_default_mode, get_mode, optdb
from pytensor_tpu.compile.sharedvalue import SharedVariable, shared, shared_constructor
from pytensor_tpu.compile.ops import DeepCopyOp, ViewOp, as_op, deep_copy_op, view_op
from pytensor_tpu.compile.maker import function
from pytensor_tpu.compile.executor import Function
from pytensor_tpu.compile.builders import OpFromGraph
import pytensor_tpu.compile.rewriting  # noqa: F401  (inner-graph rewriting pass)
