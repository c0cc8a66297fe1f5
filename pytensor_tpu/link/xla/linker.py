"""The XLA linker: whole graph -> one jitted XLA executable.

The TPU-native replacement for the reference's CLinker/CVM/Numba stack
(SURVEY §7): the rewritten FunctionGraph is traced once into jax, jit
compiles it to a single XLA executable, shared-variable updates ride
buffer donation (input_output_aliases) so training loops never leave the
chip.
"""

from __future__ import annotations

from typing import Callable, Sequence

import numpy as np

from pytensor_tpu.config import config
from pytensor_tpu.graph.basic import Constant
from pytensor_tpu.graph.fg import FunctionGraph
from pytensor_tpu.link.basic import Linker, raise_with_op
from pytensor_tpu.link.xla.dispatch import ensure_registered, xla_funcify

_x64_initialized = False


def ensure_x64():
    global _x64_initialized
    if not _x64_initialized:
        import jax

        if config.enable_x64:
            jax.config.update("jax_enable_x64", True)
        if config.xla__cache_dir:
            # persistent compilation cache: recompiles across processes hit
            # disk instead of the compiler (reference ModuleCache role).
            # Thresholds at 0: the reference's ModuleCache persists every
            # module, and the 0.5s default silently excluded exactly the
            # small latency-sensitive graphs a warm start should help.
            jax.config.update("jax_compilation_cache_dir", config.xla__cache_dir)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
            jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        _x64_initialized = True


def fgraph_to_jax(fgraph: FunctionGraph, *, carry_device_constants=False):
    """Build a python callable applying each node's XLA lowering in
    topological order (the trace that jit compiles).

    With ``carry_device_constants=True`` returns ``(fn, carry_vals)``
    where device-array constants become extra TRAILING arguments of
    ``fn`` instead of closure captures: jax lowers closed-over arrays
    as HLO literals, which for large buffers blows compile memory (and
    the remote-compile size cap on tunneled TPU backends).
    """
    ensure_registered()
    order = fgraph.toposort()
    node_fns = []
    for node in order:
        fn = xla_funcify(node.op, node=node)
        node_fns.append((fn, node))
    constants = [v for v in fgraph.variables if isinstance(v, Constant)]
    # orphan constants may be referenced without being in fgraph.variables
    for fn, node in node_fns:
        for i in node.inputs:
            if isinstance(i, Constant) and i not in constants:
                constants.append(i)
    # host numpy constants embed directly into the HLO as literals at
    # trace time; device-array constants stay device-side (np.asarray on
    # them would be a host round-trip)
    from pytensor_tpu.tensor.type import TensorType

    const_vals = {}
    carry_consts = []
    for c in constants:
        data = c.data
        if type(data).__module__.startswith("jax"):
            if carry_device_constants:
                carry_consts.append(c)
            else:
                const_vals[c] = data
        elif isinstance(c.type, TensorType):
            const_vals[c] = np.asarray(data)
        else:
            const_vals[c] = data

    inputs = list(fgraph.inputs)
    outputs = list(fgraph.outputs)
    n_in = len(inputs)

    def compiled(*args):
        storage = dict(const_vals)
        for var, val in zip(inputs, args):
            storage[var] = val
        for var, val in zip(carry_consts, args[n_in:]):
            storage[var] = val
        for fn, node in node_fns:
            vals = [storage[i] for i in node.inputs]
            try:
                res = fn(*vals)
            except Exception:
                raise_with_op(fgraph, node)
            if len(node.outputs) == 1 and not isinstance(res, tuple):
                storage[node.outputs[0]] = res
            else:
                if not isinstance(res, (list, tuple)):
                    res = (res,)
                for o, r in zip(node.outputs, res):
                    storage[o] = r
        return tuple(storage[o] for o in outputs)

    if carry_device_constants:
        return compiled, [c.data for c in carry_consts]
    return compiled


def _shape_port_indices(op) -> tuple[int, ...] | None:
    """Input positions of ``op`` whose VALUES determine output shapes.

    XLA requires static shapes under jit; a graph input flowing into one
    of these ports must be passed as a ``static_argnum`` (re-jit per
    value) instead of a traced array.  The reference's own JAX backend
    simply errors on these graphs (link/jax/dispatch/tensor_basic.py
    "Concrete value"); we recover the C-backend's capability instead.
    """
    from pytensor_tpu.tensor.basic import Alloc, AllocEmpty, ARange, Eye, Split
    from pytensor_tpu.tensor.random.op import RandomVariable
    from pytensor_tpu.tensor.shape import Reshape

    if isinstance(op, ARange):
        return (0, 1, 2)
    if isinstance(op, Eye):
        return (0, 1, 2)
    if isinstance(op, Alloc):
        return tuple(range(1, 64))
    if isinstance(op, AllocEmpty):
        return tuple(range(64))
    if isinstance(op, Reshape):
        return (1,)
    if isinstance(op, Split):
        return (1, 2)
    if isinstance(op, RandomVariable):
        return (1,)
    from pytensor_tpu.scan.op import Scan

    if isinstance(op, Scan):
        # the trace length is a buffer shape (scan/op.py:677 requires a
        # concrete step count at trace time)
        return (0,)
    from pytensor_tpu.tensor.subtensor import DYN, IncSubtensor, Subtensor

    if isinstance(op, (Subtensor, IncSubtensor)):
        # dynamic SLICE BOUNDS determine the output/window shape and must
        # be concrete at trace time; dynamic scalar indices stay traced
        # (they lower to gathers/dynamic slices)
        pos = 1 if isinstance(op, Subtensor) else 2
        ports = []
        for e in op.idx_list:
            if e == DYN:
                pos += 1
            elif isinstance(e, tuple) and e and e[0] == "slice":
                for comp in e[1:]:
                    if comp == DYN:
                        ports.append(pos)
                        pos += 1
        return tuple(ports)
    from pytensor_tpu.tensor.subtensor import (
        AdvancedIncSubtensor,
        AdvancedSubtensor,
    )

    if isinstance(op, (AdvancedSubtensor, AdvancedIncSubtensor)):
        # same rule for slice bounds mixed with advanced indices; the
        # advanced ARRAYS themselves stay traced (gather/scatter lowering)
        pos = 1 if isinstance(op, AdvancedSubtensor) else 2
        ports = []
        for e in op.idx_list:
            if e == DYN:
                pos += 1
            elif isinstance(e, tuple) and e and e[0] == "slice":
                for comp in e[1:]:
                    if comp == DYN:
                        ports.append(pos)
                        pos += 1
        return tuple(ports)
    from pytensor_tpu.tensor.blockwise import Blockwise

    if isinstance(op, Blockwise):
        # batched core op: inputs map 1:1, and a shape port of the core is
        # a shape port of the batched node (the lowering keeps broadcast-
        # invariant args unbatched so their values stay concrete)
        return _shape_port_indices(op.core_op)
    return None


def _static_input_indices(fgraph: FunctionGraph) -> tuple[int, ...]:
    """Explicit-input indices that must be jit-static (feed shape ports).

    Conservative ancestor closure from every shape port; only small
    integer scalars/vectors qualify — anything else keeps the trace-time
    error from the lowering itself.
    """
    from pytensor_tpu.graph.basic import Constant

    tainted: set = set()
    stack = []
    for node in fgraph.toposort():
        ports = _shape_port_indices(node.op)
        if not ports:
            continue
        for i, inp in enumerate(node.inputs):
            if i in ports and not isinstance(inp, Constant):
                stack.append(inp)
    from pytensor_tpu.tensor.shape import Shape, Shape_i

    while stack:
        v = stack.pop()
        if v in tainted:
            continue
        tainted.add(v)
        if v.owner is not None and not isinstance(v.owner.op,
                                                  (Shape, Shape_i)):
            # Shape/Shape_i outputs are static under jit whatever their
            # input VALUES are — never taint the data array behind them
            stack.extend(i for i in v.owner.inputs if not isinstance(i, Constant))
    out = []
    for idx, inp in enumerate(fgraph.inputs):
        if inp in tainted:
            dtype = getattr(inp.type, "dtype", "")
            ndim = getattr(inp.type, "ndim", None)
            if str(dtype).startswith(("int", "uint")) and ndim in (0, 1):
                out.append(idx)
    return tuple(out)


class XlaLinker(Linker):
    """Linker producing a jitted callable over (explicit + shared) inputs."""

    # rewrite tags this backend requires / cannot use (consumed by Mode)
    required_rewrites = ("xla",)
    incompatible_rewrites = ("inplace", "cxx_only")

    def __init__(self, donate_argnums: Sequence[int] = (), jit: bool | None = None,
                 device=None, in_shardings=None, out_shardings=None, mesh=None):
        self.donate_argnums = tuple(donate_argnums)
        self.jit = config.xla__jit if jit is None else jit
        self.device = device
        self.in_shardings = in_shardings
        self.out_shardings = out_shardings
        self.mesh = mesh
        self.fgraph = None

    def accept(self, fgraph, no_recycling=(), profile=None):
        self.fgraph = fgraph
        return self

    def make_jax_fn(self, donate_argnums=None):
        import jax

        ensure_x64()
        fn, carry = fgraph_to_jax(self.fgraph, carry_device_constants=True)
        if not self.jit:
            if carry:
                inner_nojit = fn
                return lambda *args: inner_nojit(*args, *carry)
            return fn
        donate = donate_argnums if donate_argnums is not None else self.donate_argnums
        kwargs = {}
        if self.in_shardings is not None:
            kwargs["in_shardings"] = self.in_shardings
        if self.out_shardings is not None:
            kwargs["out_shardings"] = self.out_shardings
        prec = config.xla__matmul_precision
        if prec == "default":
            # the general flag (also consulted by the einsum lowering)
            legacy = config.matmul_precision
            prec = {"high": "tensorfloat32", "highest": "highest",
                    "bfloat16": "bfloat16", "float32": "float32",
                    "default": "default"}.get(legacy, "default")
        if prec != "default":
            inner = fn

            def fn(*args, _inner=inner, _prec=prec):
                with jax.default_matmul_precision(_prec):
                    return _inner(*args)

        static_idx = _static_input_indices(self.fgraph)
        if static_idx:
            # shape-determining integer inputs become hashable python
            # values; jit caches one executable per distinct combination
            jitted_s = jax.jit(fn, donate_argnums=donate or (),
                               static_argnums=static_idx, **kwargs)
            sset = set(static_idx)

            def call_static(*args):
                args = [
                    (int(a) if np.ndim(a) == 0 else tuple(int(v) for v in np.asarray(a)))
                    if i in sset else a
                    for i, a in enumerate(args)
                ]
                return jitted_s(*args, *carry)

            return call_static
        jitted = jax.jit(fn, donate_argnums=donate or (), **kwargs)
        if (config.xla__cache_dir and config.xla__aot_cache
                and self.in_shardings is None and self.out_shardings is None
                and self.mesh is None):
            return _aot_cached_call(jitted, carry, self.fgraph,
                                    donate or (), prec)
        if carry:
            return lambda *args: jitted(*args, *carry)
        return jitted


def _aot_graph_sig(fgraph) -> str:
    """Structural signature with FULL constant-byte hashing (the
    debugmode one truncates constants to 16 bytes — fine for structural
    comparison, unacceptable for an executable-cache key where a
    collision silently returns wrong results)."""
    import hashlib

    in_pos = {v: i for i, v in enumerate(fgraph.inputs)}
    memo = {}

    def sig(v):
        if v in memo:
            return memo[v]
        if v in in_pos:
            s = f"in{in_pos[v]}[{v.type}]"
        elif isinstance(v, Constant):
            try:
                body = hashlib.sha256(
                    np.ascontiguousarray(np.asarray(v.data)).tobytes()
                ).hexdigest()
            except Exception:
                body = repr(v.data)
            s = f"const[{v.type}]{body}"
        elif v.owner is None:
            s = f"free[{v.type}]"
        else:
            node = v.owner
            op = node.op
            inner = getattr(op, "fgraph", None)
            op_s = (f"{type(op).__name__}<{_aot_graph_sig(inner)}>"
                    if inner is not None else str(op))
            args = ",".join(sig(i) for i in node.inputs)
            s = f"{op_s}({args})#{node.outputs.index(v)}"
        memo[v] = s
        return s

    return ";".join(sig(o) for o in fgraph.outputs)


def _aot_cached_call(jitted, carry, fgraph, donate, prec):
    """AOT executable cache: pickle compiled executables keyed by graph
    signature + call shapes so warm PROCESSES skip trace AND compile
    (reference link/c/cmodule.py:612 ModuleCache role — it pickles the
    whole compiled module; here jax.experimental.serialize_executable
    plays that part).  Any failure falls back to the plain jit path."""
    import hashlib
    import os
    import pickle

    import jax

    state = {"sig": None}
    loaded = {}

    def _key(full_args):
        if state["sig"] is None:
            import jaxlib

            base = [
                _aot_graph_sig(fgraph),
                jax.__version__,
                getattr(jaxlib, "__version__", "?"),
                jax.default_backend(),
                str(jax.config.jax_enable_x64),
                str(tuple(donate)),
                str(prec),
            ]
            state["sig"] = hashlib.sha256(
                "|".join(base).encode()).hexdigest()[:24]
        shapes = ",".join(
            f"{getattr(a, 'dtype', type(a).__name__)}{getattr(a, 'shape', ())}"
            for a in full_args)
        h = hashlib.sha256(shapes.encode()).hexdigest()[:16]
        return f"{state['sig']}-{h}"

    def call(*args):
        full = (*args, *carry)
        try:
            key = _key(full)
        except Exception:
            return jitted(*full)
        compiled = loaded.get(key)
        if compiled is None:
            from jax.experimental import serialize_executable as _se

            path = os.path.join(config.xla__cache_dir, f"aot-{key}.pkl")
            if os.path.exists(path):
                try:
                    with open(path, "rb") as fh:
                        payload, in_tree, out_tree = pickle.load(fh)
                    compiled = _se.deserialize_and_load(
                        payload, in_tree, out_tree)
                except Exception:
                    compiled = None  # stale/foreign entry: recompile
            if compiled is None:
                compiled = jitted.lower(*full).compile()
                try:
                    os.makedirs(config.xla__cache_dir, exist_ok=True)
                    tmp = f"{path}.tmp.{os.getpid()}"
                    with open(tmp, "wb") as fh:
                        pickle.dump(_se.serialize(compiled), fh)
                    os.replace(tmp, path)  # atomic vs concurrent builders
                except Exception:
                    pass
            loaded[key] = compiled
        try:
            return compiled(*full)
        except Exception:
            # donated-buffer reuse, device mismatch, ...: the jit path
            # owns all those semantics
            loaded.pop(key, None)
            return jitted(*full)

    call.lower = lambda *args: jitted.lower(*args, *carry)
    call.jit_fn = jitted
    return call
