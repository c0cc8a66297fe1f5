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

from pytensor_tpu.compile.mode import (  # noqa: F401,E402
    C,
    CVM,
    JAX,
    MLX,
    NUMBA,
    PYTORCH,
    AddDestroyHandler,
    AddFeatureOptimizer,
    PrintCurrentFunctionGraph,
    local_useless,
)
from pytensor_tpu.compile.executor import AliasedMemoryError  # noqa: F401,E402
from pytensor_tpu.compile.aliasing import (  # noqa: F401,E402
    alias_root,
    view_tree_set,
)
from pytensor_tpu.compile.ops import (  # noqa: F401,E402
    register_deep_copy_op_c_code,
    register_view_op_c_code,
)
from pytensor_tpu.compile import compilelock, inner_function  # noqa: F401,E402
from pytensor_tpu.compile.aliasing import add_supervisor_to_fgraph  # noqa: F401,E402
from pytensor_tpu.compile.train import train_loop  # noqa: F401,E402
