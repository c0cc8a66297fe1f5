from pytensor_tpu.compile.io import In, Out, SymbolicInput, SymbolicOutput
from pytensor_tpu.compile.mode import FAST_COMPILE, FAST_RUN, Mode, get_default_mode, get_mode, optdb
from pytensor_tpu.compile.sharedvalue import SharedVariable, shared, shared_constructor
from pytensor_tpu.compile.ops import DeepCopyOp, ViewOp, as_op, deep_copy_op, view_op
from pytensor_tpu.compile.maker import function
from pytensor_tpu.compile.executor import Function
from pytensor_tpu.compile.builders import OpFromGraph
import pytensor_tpu.compile.rewriting  # noqa: F401  (inner-graph rewriting pass)

# reference-namespace completion (SURVEY §2.7)
from pytensor_tpu.compile import aliasing, debug, rebuild  # noqa: F401,E402
from pytensor_tpu.compile.aliasing import (  # noqa: F401,E402
    Supervisor,
    infer_reuse_pattern,
    insert_deepcopy,
)
from pytensor_tpu.compile.debug.monitormode import MonitorMode  # noqa: F401,E402
from pytensor_tpu.compile.debug.profiling import ProfileStats  # noqa: F401,E402
from pytensor_tpu.compile.debug.dump import dump_function as function_dump  # noqa: F401,E402
from pytensor_tpu.compile.maker import FunctionMaker, UnusedInputError  # noqa: F401,E402
from pytensor_tpu.compile.mode import (  # noqa: F401,E402
    JAX,
    OPT_FAST_COMPILE,
    OPT_FAST_RUN,
    OPT_FAST_RUN_STABLE,
    OPT_MERGE,
    OPT_NONE,
    OPT_O2,
    OPT_O3,
    OPT_STABILIZE,
    OPT_UNSAFE,
    predefined_linkers,
    predefined_modes,
    predefined_optimizers,
    register_linker,
    register_mode,
    register_optimizer,
)
from pytensor_tpu.compile.ops import FromFunctionOp, wrap_py  # noqa: F401,E402
from pytensor_tpu.compile.rebuild import rebuild_collect_shared  # noqa: F401,E402
