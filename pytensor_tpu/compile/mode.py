"""Modes: linker + rewrite query; the global pass pipeline (optdb).

Parallels /root/reference/pytensor/compile/mode.py (Mode:332, optdb:190,
predefined modes :510-539).  The pass schedule mirrors the reference's
optdb positions (SURVEY Appendix A): merge1(0) -> useless(0.6) ->
canonicalize(1) -> stabilize(1.5) -> specialize(2) -> uncanonicalize(3)
-> merge2(49) -> fusion(49) -> merge3(100).  Inplace/destroy passes are
not rebuilt: XLA buffer donation supplies in-place semantics.
"""

from __future__ import annotations

from pytensor_tpu.config import config
from pytensor_tpu.graph.rewriting.basic import GraphRewriter, MergeOptimizer
from pytensor_tpu.graph.rewriting.db import (
    EquilibriumDB,
    RewriteDatabaseQuery,
    SequenceDB,
    TopoDB,
)
from pytensor_tpu.link.basic import PerformLinker
from pytensor_tpu.link.xla.linker import XlaLinker

# --- the global rewrite database -------------------------------------------

optdb = SequenceDB(name="optdb")

optdb.register("merge1", MergeOptimizer(), "fast_run", "fast_compile", "merge",
               position=0)

# removal-only cheap rewrites
useless = TopoDB(name="useless")
optdb.register("useless", useless, "fast_run", "fast_compile", position=0.6)

optdb.register("merge1.1", MergeOptimizer(), "fast_run", "fast_compile", "merge",
               position=0.65)

canonicalize = EquilibriumDB(name="canonicalize")
optdb.register("canonicalize", canonicalize, "fast_run", "fast_compile", position=1)

optdb.register("merge1.2", MergeOptimizer(), "fast_run", "fast_compile", "merge",
               position=1.2)

stabilize = EquilibriumDB(name="stabilize")
optdb.register("stabilize", stabilize, "fast_run", position=1.5)

specialize = EquilibriumDB(name="specialize")
optdb.register("specialize", specialize, "fast_run", position=2)

uncanonicalize = EquilibriumDB(name="uncanonicalize")
optdb.register("uncanonicalize", uncanonicalize, "fast_run", position=3)

optdb.register("merge2", MergeOptimizer(), "fast_run", "merge", position=49)

# elemwise fusion region (position 49, reference tensor/rewriting/elemwise.py:1291)
fusedb = SequenceDB(name="elemwise_fusion")
optdb.register("elemwise_fusion", fusedb, "fast_run", "fusion", position=49.05)

optdb.register("merge3", MergeOptimizer(), "fast_run", "merge", position=100)


class CheckStackTraceRewriter(GraphRewriter):
    """Final no-op audit pass (reference tensor/rewriting CheckStackTrace /
    check_stack_trace mode option): verifies every Apply produced by the
    rewrite pipeline still carries a creation trace so runtime errors can
    be attributed to user model code.  Warns (never fails) on untagged
    nodes; excluded by default — select with ``.including("check_stack_trace")``
    or via a mode's query."""

    name = "check_stack_trace"

    def apply(self, fgraph):
        import warnings

        missing = [
            node for node in fgraph.apply_nodes
            if not getattr(node.outputs[0].tag, "trace", None)
            and node.outputs[0].name is None
        ]
        if missing:
            ops = sorted({type(n.op).__name__ for n in missing})
            warnings.warn(
                f"check_stack_trace: {len(missing)} rewritten nodes lost "
                f"their creation trace (ops: {', '.join(ops[:8])}). A rewrite "
                "is missing a copy_stack_trace call.",
                stacklevel=2,
            )
        return len(missing)


optdb.register("check_stack_trace", CheckStackTraceRewriter(),
               "check_stack_trace", position=101)


# convenient registration helpers (reference tensor/rewriting/basic.py:261)
def register_canonicalize(rewrite, *tags, name=None, **kwargs):
    name = name or getattr(rewrite, "name", None) or getattr(rewrite, "__name__", str(rewrite))
    canonicalize.register(name, rewrite, "fast_run", "fast_compile", *tags, **kwargs)
    return rewrite


def register_stabilize(rewrite, *tags, name=None, **kwargs):
    name = name or getattr(rewrite, "name", None) or getattr(rewrite, "__name__", str(rewrite))
    stabilize.register(name, rewrite, "fast_run", *tags, **kwargs)
    return rewrite


def register_specialize(rewrite, *tags, name=None, **kwargs):
    name = name or getattr(rewrite, "name", None) or getattr(rewrite, "__name__", str(rewrite))
    specialize.register(name, rewrite, "fast_run", *tags, **kwargs)
    return rewrite


def register_uncanonicalize(rewrite, *tags, name=None, **kwargs):
    name = name or getattr(rewrite, "name", None) or getattr(rewrite, "__name__", str(rewrite))
    uncanonicalize.register(name, rewrite, "fast_run", *tags, **kwargs)
    return rewrite


def register_useless(rewrite, *tags, name=None, **kwargs):
    name = name or getattr(rewrite, "name", None) or getattr(rewrite, "__name__", str(rewrite))
    useless.register(name, rewrite, "fast_run", "fast_compile", *tags, **kwargs)
    return rewrite


# --- Mode -------------------------------------------------------------------

predefined_linkers = {
    "py": PerformLinker,
    "xla": XlaLinker,
}


class Mode:
    """A linker plus a rewrite-database query."""

    def __init__(self, linker=None, optimizer="fast_run", db=None):
        if linker is None:
            linker = "xla"
        self.linker = linker
        if isinstance(optimizer, str):
            optimizer = RewriteDatabaseQuery(include=[optimizer] if optimizer != "None" else [])
        self.provided_optimizer = optimizer
        self._optimizer = optimizer
        self.db = db if db is not None else optdb
        self.call_time = 0.0
        self.fn_time = 0.0

    @property
    def optdb(self):
        return self.db

    def make_linker(self, **kwargs):
        linker = self.linker
        if isinstance(linker, str):
            linker = predefined_linkers[linker]()
        elif isinstance(linker, type):
            linker = linker()
        return linker

    @property
    def optimizer(self):
        query = self._optimizer
        linker = self.linker
        cls = predefined_linkers.get(linker, None) if isinstance(linker, str) else type(linker)
        req = getattr(cls, "required_rewrites", ()) or ()
        inc = getattr(cls, "incompatible_rewrites", ()) or ()
        if req:
            query = query.including(*req)
        if inc:
            query = query.excluding(*inc)
        return self.db.query(query)

    def including(self, *tags):
        m = Mode(self.linker, self._optimizer.including(*tags), self.db)
        return m

    def excluding(self, *tags):
        return Mode(self.linker, self._optimizer.excluding(*tags), self.db)

    def requiring(self, *tags):
        return Mode(self.linker, self._optimizer.requiring(*tags), self.db)

    def register(self, *rewrites):
        return Mode(self.linker, self._optimizer.register(*rewrites), self.db)

    def __str__(self):
        return f"Mode(linker={self.linker}, optimizer={self._optimizer})"


FAST_COMPILE = Mode("py", RewriteDatabaseQuery(include=["fast_compile"]))
FAST_RUN = Mode("xla", RewriteDatabaseQuery(include=["fast_run"]))
XLA = FAST_RUN
PY = Mode("py", RewriteDatabaseQuery(include=["fast_run"]))

predefined_modes = {
    "FAST_COMPILE": FAST_COMPILE,
    "FAST_RUN": FAST_RUN,
    "XLA": XLA,
    "PY": PY,
}


def get_mode(mode):
    if mode is None:
        mode = config.mode
    if isinstance(mode, str):
        if mode == "DebugMode":
            from pytensor_tpu.compile.debug.debugmode import DebugMode

            return DebugMode()
        if mode == "NanGuardMode":
            from pytensor_tpu.compile.debug.nanguardmode import NanGuardMode

            return NanGuardMode()
        if mode not in predefined_modes:
            raise ValueError(f"Unknown mode {mode!r}")
        return predefined_modes[mode]
    return mode


def get_default_mode():
    return get_mode(None)


# --- registries + canned optimizer queries (reference mode.py surface) ----

predefined_optimizers = {
    "fast_run": RewriteDatabaseQuery(include=["fast_run"]),
    "fast_compile": RewriteDatabaseQuery(include=["fast_compile"]),
    "None": RewriteDatabaseQuery(include=[]),
    "merge": RewriteDatabaseQuery(include=["merge"]),
}
OPT_NONE = predefined_optimizers["None"]
OPT_MERGE = predefined_optimizers["merge"]
OPT_FAST_COMPILE = predefined_optimizers["fast_compile"]
OPT_FAST_RUN = predefined_optimizers["fast_run"]
OPT_FAST_RUN_STABLE = OPT_FAST_RUN
OPT_O2 = OPT_FAST_RUN
OPT_O3 = OPT_FAST_RUN
OPT_STABILIZE = RewriteDatabaseQuery(include=["fast_run", "stabilize"])
OPT_UNSAFE = OPT_FAST_RUN
JAX = FAST_RUN  # the XLA linker IS this framework's jax mode


def register_linker(name, linker_cls):
    predefined_linkers[name] = linker_cls


def register_optimizer(name, query):
    predefined_optimizers[name] = query


def register_mode(name, mode):
    predefined_modes[name] = mode


class AddDestroyHandler(GraphRewriter):
    """Attach the DestroyHandler feature (reference compile/mode.py:118).
    On the XLA path in-place safety is the compiler's job; this remains
    meaningful for oracle linkers and inplace-style rewrites."""

    def apply(self, fgraph):
        pass

    def add_requirements(self, fgraph):
        from pytensor_tpu.graph.destroyhandler import DestroyHandler
        from pytensor_tpu.graph.features import AlreadyThere

        try:
            fgraph.attach_feature(DestroyHandler())
        except AlreadyThere:
            pass


class AddFeatureOptimizer(GraphRewriter):
    """Attach an arbitrary feature as a rewrite step (reference
    compile/mode.py:155)."""

    def __init__(self, feature):
        self.feature = feature

    def apply(self, fgraph):
        pass

    def add_requirements(self, fgraph):
        from pytensor_tpu.graph.features import AlreadyThere

        try:
            fgraph.attach_feature(self.feature)
        except AlreadyThere:
            pass


class PrintCurrentFunctionGraph(GraphRewriter):
    """Debug rewrite step: print the graph when reached (reference
    compile/mode.py:171)."""

    def __init__(self, header=""):
        self.header = header

    def apply(self, fgraph):
        from pytensor_tpu.printing import debugprint

        if self.header:
            print(self.header)
        debugprint(fgraph)


# reference mode-name constants.  This framework has ONE production
# backend (XLA); requesting another backend's mode gets the equivalent
# here: the oracle (py/C-VM analog) for C/CVM, the XLA path for the JIT
# family — same spirit as jax ignoring an unavailable platform.
C = Mode(linker="py", optimizer="fast_run")
CVM = C
NUMBA = FAST_RUN
JAX = FAST_RUN
PYTORCH = FAST_RUN
MLX = FAST_RUN

local_useless = useless  # reference compile/mode.py:201 name
