"""Graph core: the IR every other layer builds on.

Parallels /root/reference/pytensor/graph/ (SURVEY.md §2.1) with an
original, slimmer implementation: Variable/Apply/Constant datatypes, the
Op and Type protocols, FunctionGraph with Features, traversal utilities,
and clone/replace/vectorize.
"""

from pytensor_tpu.graph.basic import (
    Apply,
    AtomicVariable,
    Constant,
    NominalVariable,
    Variable,
    clone,
    clone_get_equiv,
)
from pytensor_tpu.graph.fg import FunctionGraph
from pytensor_tpu.graph.op import Op
from pytensor_tpu.graph.replace import clone_replace, graph_replace, vectorize_graph
from pytensor_tpu.graph.rewriting.basic import (  # noqa: F401
    graph_rewriter,
    node_rewriter,
)
from pytensor_tpu.graph.rewriting.db import RewriteDatabaseQuery  # noqa: F401
from pytensor_tpu.graph.rewriting.utils import rewrite_graph  # noqa: F401
from pytensor_tpu.graph import destroyhandler  # noqa: F401
import pytensor_tpu.utils as utils  # noqa: F401  (reference graph.utils analog)
from pytensor_tpu.graph.traversal import (
    ancestors,
    applys_between,
    explicit_graph_inputs,
    graph_inputs,
    io_toposort,
    toposort,
    vars_between,
)
from pytensor_tpu.graph.type import Type
