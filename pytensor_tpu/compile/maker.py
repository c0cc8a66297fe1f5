"""pytensor_tpu.function: the compile driver.

Parallels /root/reference/pytensor/compile/maker.py (function:65,
FunctionMaker:264) + compile/rebuild.py (rebuild_collect_shared:24).
Pipeline: apply givens -> discover shared variables & default updates ->
clone into a FunctionGraph (outputs = user outputs + update exprs) ->
run the mode's rewrite query -> link (XLA jit with donated shared
buffers, or the numpy oracle VM) -> wrap in a Function.
"""

from __future__ import annotations

import time
from typing import Any, Sequence

import numpy as np

from pytensor_tpu.config import config
from pytensor_tpu.compile.io import In, Out, SymbolicInput, SymbolicOutput
from pytensor_tpu.compile.mode import Mode, get_mode
from pytensor_tpu.compile.sharedvalue import SharedVariable
from pytensor_tpu.graph.basic import Constant, Variable, clone_get_equiv
from pytensor_tpu.graph.fg import FunctionGraph
from pytensor_tpu.graph.traversal import graph_inputs
from pytensor_tpu.link.basic import PerformLinker
from pytensor_tpu.link.xla.linker import XlaLinker


class UnusedInputError(Exception):
    pass


def function(
    inputs: Sequence,
    outputs=None,
    mode=None,
    updates=None,
    givens=None,
    no_default_updates: bool = False,
    name: str | None = None,
    rebuild_strict: bool = True,
    allow_input_downcast: bool | None = None,
    profile=None,
    on_unused_input: str = "raise",
    trust_input: bool = False,
):
    """Compile a callable from graph inputs to outputs."""
    from pytensor_tpu.compile.executor import Function

    t0 = time.perf_counter()
    mode_arg = mode if isinstance(mode, str) or mode is None else None
    if profile is None:
        profile = config.profile

    # --- normalize inputs/outputs
    if isinstance(inputs, (Variable, SymbolicInput)):
        inputs = [inputs]
    wrapped_inputs: list[SymbolicInput] = []
    for i in inputs:
        if isinstance(i, SymbolicInput):
            if isinstance(i.variable, SharedVariable) and i.update is None:
                raise TypeError("In(shared) without update is implicit already")
            wrapped_inputs.append(i)
        elif isinstance(i, SharedVariable):
            raise TypeError(
                "Shared variables must not be passed as explicit inputs; "
                "they are implicit."
            )
        elif isinstance(i, Variable):
            wrapped_inputs.append(In(i, allow_downcast=allow_input_downcast))
        else:
            raise TypeError(f"function inputs must be Variables, got {type(i)}")

    unpack_single = False
    if outputs is None:
        outputs_list: list[Variable] = []
    elif isinstance(outputs, (Variable, SymbolicOutput)):
        outputs_list = [outputs.variable if isinstance(outputs, SymbolicOutput) else outputs]
        unpack_single = True
    else:
        outputs_list = [
            o.variable if isinstance(o, SymbolicOutput) else o for o in outputs
        ]

    # --- updates: explicit dict/list + In(update=...)
    update_pairs: list[tuple[SharedVariable, Variable]] = []
    if updates is not None:
        items = updates.items() if isinstance(updates, dict) else list(updates)
        seen_targets = set()
        for k, v in items:
            if not isinstance(k, SharedVariable):
                raise TypeError(f"update target {k} is not a shared variable")
            if k in seen_targets:
                raise ValueError(
                    f"this shared variable is updated twice: {k}; the "
                    f"second update would silently win")
            seen_targets.add(k)
            update_pairs.append((k, k.type.filter_variable(v)))
    for wi in wrapped_inputs:
        if wi.update is not None:
            if isinstance(wi.variable, SharedVariable):
                update_pairs.append(
                    (wi.variable, wi.variable.type.filter_variable(wi.update))
                )
            else:
                raise NotImplementedError(
                    "In(update=...) on non-shared inputs — pass updates= instead"
                )

    # --- givens substitution on all exprs
    givens_items = []
    if givens:
        givens_items = list(givens.items()) if isinstance(givens, dict) else list(givens)
    exprs = outputs_list + [v for _, v in update_pairs]
    if givens_items:
        from pytensor_tpu.graph.replace import graph_replace

        exprs = graph_replace(exprs, replace=givens_items, strict=False) if exprs else exprs
        outputs_list = exprs[: len(outputs_list)]
        update_pairs = [
            (k, e) for (k, _), e in zip(update_pairs, exprs[len(outputs_list):])
        ]

    explicit_vars = [wi.variable for wi in wrapped_inputs]

    # --- discover shared vars (+ default updates) to fixpoint
    shared_vars: list[SharedVariable] = []
    seen_shared = set()

    def discover(vs):
        for v in graph_inputs(vs):
            if isinstance(v, SharedVariable) and v not in seen_shared:
                seen_shared.add(v)
                shared_vars.append(v)

    discover(exprs := outputs_list + [v for _, v in update_pairs])
    for k, _ in update_pairs:
        if k not in seen_shared:
            seen_shared.add(k)
            shared_vars.append(k)
    # default updates
    changed = True
    while changed:
        changed = False
        for sv in list(shared_vars):
            du = getattr(sv, "default_update", None)
            if du is not None and not no_default_updates and not any(
                k is sv for k, _ in update_pairs
            ):
                update_pairs.append((sv, sv.type.filter_variable(du)))
                before = len(shared_vars)
                discover([du])
                if len(shared_vars) != before:
                    changed = True
                changed = True

    update_exprs = [v for _, v in update_pairs]
    all_outputs = outputs_list + update_exprs

    # --- unused input check
    used = set(graph_inputs(all_outputs)) if all_outputs else set()
    for wi in wrapped_inputs:
        if wi.variable not in used:
            if on_unused_input == "raise":
                raise UnusedInputError(
                    f"function input {wi.variable} is unused; pass "
                    "on_unused_input='ignore' to allow"
                )
            elif on_unused_input == "warn":
                import warnings

                warnings.warn(f"unused input {wi.variable}")

    # --- clone into an fgraph
    all_inputs = explicit_vars + shared_vars
    memo = clone_get_equiv(all_inputs, all_outputs, copy_inputs=True, copy_orphans=False)
    fg_inputs = [memo[i] for i in all_inputs]
    fg_outputs = [memo[o] for o in all_outputs]
    update_mapping = {
        len(outputs_list) + ui: len(explicit_vars) + shared_vars.index(k)
        for ui, (k, _) in enumerate(update_pairs)
    }
    fgraph = FunctionGraph(fg_inputs, fg_outputs, clone=False,
                           update_mapping=update_mapping)
    t_graph = time.perf_counter()

    # --- rewrite
    mode = get_mode(mode)
    rewriter = mode.optimizer
    rewrite_profile = rewriter.rewrite(fgraph)
    t_rewrite = time.perf_counter()

    # --- link
    linker = mode.make_linker()
    linker.accept(fgraph)
    n_outs = len(outputs_list)
    fn = Function(
        linker=linker,
        fgraph=fgraph,
        explicit_inputs=wrapped_inputs,
        shared_vars=shared_vars,
        update_pairs=update_pairs,
        n_user_outputs=n_outs,
        unpack_single=unpack_single,
        name=name,
        trust_input=trust_input,
        profile=profile,
        mode=mode,
    )
    fn._spec = dict(
        inputs=explicit_vars,
        outputs=outputs_list,
        updates=update_pairs,
        unpack_single=unpack_single,
        name=name,
        trust_input=trust_input,
        mode=mode_arg,
    )
    fn.compile_time = time.perf_counter() - t0
    fn.rewrite_time = t_rewrite - t_graph
    fn.rewrite_profile = rewrite_profile
    if profile:
        from pytensor_tpu.compile.debug.profiling import profile_function

        profile_function(fn)
    return fn


def predict_function_backend(mode=None) -> str:
    m = get_mode(mode)
    return m.linker if isinstance(m.linker, str) else type(m.linker).__name__


class FunctionMaker:
    """Thin reference-parity facade (reference compile/maker.py:264): the
    build pipeline here lives in `function()`; this class records the spec
    and can (re)create Functions from it — what unpickling uses."""

    def __init__(self, inputs, outputs, mode=None, updates=None, givens=None,
                 name=None, **kwargs):
        self.inputs = inputs
        self.outputs = outputs
        self.mode = mode
        self.updates = updates
        self.givens = givens
        self.name = name
        self.kwargs = kwargs

    def create(self):
        return function(self.inputs, self.outputs, mode=self.mode,
                        updates=self.updates, givens=self.givens,
                        name=self.name, **self.kwargs)
