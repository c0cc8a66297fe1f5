"""Linker protocol, Container, and the numpy oracle VM.

Parallels /root/reference/pytensor/link/basic.py (Container:30, Linker:138,
PerformLinker:273) and link/utils.py ``raise_with_op``.
"""

from __future__ import annotations

import sys
import traceback
from typing import Any, Callable, Sequence

from pytensor_tpu.graph.basic import Constant, Variable
from pytensor_tpu.graph.fg import FunctionGraph


class Container:
    """A one-element storage cell shared between graph and runtime."""

    __slots__ = ("type", "storage", "readonly", "strict", "allow_downcast", "name")

    def __init__(self, type, storage=None, readonly=False, strict=False,
                 allow_downcast=None, name=None):
        self.type = type
        self.storage = storage if storage is not None else [None]
        self.readonly = readonly
        self.strict = strict
        self.allow_downcast = allow_downcast
        self.name = name

    @property
    def value(self):
        return self.storage[0]

    @value.setter
    def value(self, v):
        if self.readonly:
            raise Exception(f"Cannot set readonly container {self.name}")
        if v is None:
            self.storage[0] = None
            return
        self.storage[0] = self.type.filter(
            v, strict=self.strict, allow_downcast=self.allow_downcast
        )

    data = value

    def __str__(self):
        return f"<{self.storage[0]}>"


def raise_with_op(fgraph, node, exc_info=None):
    """Re-raise the current exception annotated with the failing node and
    the user-level creation trace (reference link/utils.py:271)."""
    if exc_info is None:
        exc_info = sys.exc_info()
    exc_type, exc_value, exc_trace = exc_info
    trace_info = ""
    for v in node.outputs:
        tr = getattr(v.tag, "trace", None)
        if tr:
            trace_info = "".join(traceback.format_list(tr[0][-2:]))
            break
    detail = (
        f"\nApply node that caused the error: {node}"
        f"\nInputs types: {[getattr(i, 'type', None) for i in node.inputs]}"
    )
    if trace_info:
        detail += f"\nVariable created at:\n{trace_info}"
    args = exc_value.args if exc_value.args else ("",)
    exc_value.args = (str(args[0]) + detail, *args[1:])
    raise exc_value.with_traceback(exc_trace)


class Linker:
    """Interface: accept a FunctionGraph, produce a callable + io storage."""

    def accept(self, fgraph: FunctionGraph, no_recycling=(), profile=None):
        self.fgraph = fgraph
        return self

    def make_thunk(self, input_storage=None, output_storage=None, storage_map=None):
        raise NotImplementedError


class PerformLinker(Linker):
    """One Python thunk per node, evaluated in topological order.

    This is the testing oracle: pure numpy semantics, no XLA.
    """

    def __init__(self, allow_gc: bool = True):
        self.allow_gc = allow_gc
        self.fgraph = None

    def make_thunk(self, input_storage=None, output_storage=None, storage_map=None,
                   **kwargs):
        fgraph = self.fgraph
        order = fgraph.toposort()
        if storage_map is None:
            storage_map = {}
        for var in fgraph.variables:
            if var not in storage_map:
                if isinstance(var, Constant):
                    storage_map[var] = [var.data]
                else:
                    storage_map[var] = [None]
        # also map orphan constants referenced by nodes
        for node in order:
            for i in node.inputs:
                if i not in storage_map:
                    storage_map[i] = [i.data if isinstance(i, Constant) else None]
        if input_storage is None:
            input_storage = [storage_map[i] for i in fgraph.inputs]
        else:
            for i, s in zip(fgraph.inputs, input_storage):
                storage_map[i] = s
        if output_storage is None:
            output_storage = [storage_map[o] for o in fgraph.outputs]
        else:
            for o, s in zip(fgraph.outputs, output_storage):
                storage_map[o] = s

        compute_map = {var: [False] for var in storage_map}
        thunks = []
        for node in order:
            thunk = node.op.make_thunk(node, storage_map, compute_map)
            thunk.node = node
            thunks.append(thunk)

        # storage-cell lifetimes: cell dies after its last consumer runs
        # (only intermediates — keep inputs, constants and outputs alive)
        keep = set(id(storage_map[v]) for v in fgraph.inputs)
        keep.update(id(storage_map[o]) for o in fgraph.outputs)
        keep.update(id(s) for v, s in storage_map.items() if isinstance(v, Constant))
        last_use: dict[int, int] = {}
        for idx, node in enumerate(order):
            for i in node.inputs:
                cell = storage_map.get(i)
                if cell is not None and id(cell) not in keep:
                    last_use[id(cell)] = idx
        free_lists = [[] for _ in order]
        cell_by_id = {}
        for idx, node in enumerate(order):
            for i in node.inputs:
                cell = storage_map.get(i)
                if cell is not None and last_use.get(id(cell)) == idx \
                        and id(cell) not in cell_by_id:
                    cell_by_id[id(cell)] = cell
                    free_lists[idx].append(cell)
        free_tuples = tuple(tuple(fl) if self.allow_gc else () for fl in free_lists)

        hostvm = None
        try:
            from pytensor_tpu.link.c.build import get_hostvm

            hostvm = get_hostvm()
        except Exception:
            hostvm = None

        # demand-driven plan: producers per node; IfElse nodes become
        # LAZY — only the condition's producers are unconditional deps,
        # a chooser picks the taken branch's producers at run time, so
        # the oracle evaluates ONE branch like the reference CVM
        # (lazylinker_c.c lazy_rec_eval).
        from pytensor_tpu.ifelse import IfElse

        node_index = {node: k for k, node in enumerate(order)}

        def producers(vars_):
            out = []
            for v in vars_:
                k = node_index.get(v.owner) if v.owner is not None else None
                if k is not None:
                    out.append(k)
            return tuple(dict.fromkeys(out))

        lazy_present = any(isinstance(node.op, IfElse) for node in order)
        deps, choosers = [], []
        for node in order:
            if isinstance(node.op, IfElse):
                n_outs = node.op.n_outs
                cond_cell = storage_map[node.inputs[0]]
                then_deps = producers(node.inputs[1: 1 + n_outs])
                else_deps = producers(node.inputs[1 + n_outs:])

                def chooser(cond_cell=cond_cell, then_deps=then_deps,
                            else_deps=else_deps):
                    return then_deps if cond_cell[0] else else_deps

                deps.append(producers(node.inputs[:1]))
                choosers.append(chooser)
            else:
                deps.append(producers(node.inputs))
                choosers.append(None)
        deps_t = tuple(deps)
        choosers_t = tuple(choosers)
        targets_t = producers(fgraph.outputs)

        if hostvm is not None and lazy_present:
            thunk_tuple = tuple(thunks)

            def run():
                try:
                    hostvm.run_lazy(thunk_tuple, deps_t, targets_t,
                                    choosers_t, free_tuples)
                except Exception as e:
                    idx = getattr(e, "__hostvm_node_index__", None)
                    if idx is not None:
                        raise_with_op(fgraph, order[int(idx)])
                    raise
                return [s[0] for s in output_storage]

        elif hostvm is not None:
            thunk_tuple = tuple(thunks)

            def run():
                try:
                    hostvm.run_loop(thunk_tuple, free_tuples)
                except Exception as e:
                    idx = getattr(e, "__hostvm_node_index__", None)
                    if idx is not None:
                        raise_with_op(fgraph, order[int(idx)])
                    raise
                return [s[0] for s in output_storage]

        elif lazy_present:
            def run():
                state = [0] * len(order)  # 0 new, 1 expanded, 2 chosen
                done = [False] * len(order)
                stack = list(targets_t)
                while stack:
                    i = stack[-1]
                    if done[i]:
                        stack.pop()
                        continue
                    if state[i] == 0:
                        state[i] = 1
                        stack.extend(d for d in reversed(deps_t[i])
                                     if not done[d])
                        continue
                    if state[i] == 1:
                        state[i] = 2
                        if choosers_t[i] is not None:
                            stack.extend(d for d in choosers_t[i]()
                                         if not done[d])
                            continue
                    try:
                        thunks[i]()
                    except Exception:
                        raise_with_op(fgraph, thunks[i].node)
                    if self.allow_gc:
                        for cell in free_lists[i]:
                            cell[0] = None
                    done[i] = True
                    stack.pop()
                return [s[0] for s in output_storage]

        else:
            def run():
                for k, thunk in enumerate(thunks):
                    try:
                        thunk()
                    except Exception:
                        raise_with_op(fgraph, thunk.node)
                    if self.allow_gc:
                        for cell in free_lists[k]:
                            cell[0] = None
                return [s[0] for s in output_storage]

        run.storage_map = storage_map
        run.thunks = thunks
        run.input_storage = input_storage
        run.output_storage = output_storage
        run.allow_gc = self.allow_gc
        return run, input_storage, output_storage


class WrapLinker(Linker):
    """Run per-node callbacks around another linker's thunks (the
    MonitorMode hook point)."""

    def __init__(self, linker: PerformLinker, wrapper: Callable):
        self.linker = linker
        self.wrapper = wrapper

    def accept(self, fgraph, **kwargs):
        self.fgraph = fgraph
        self.linker.accept(fgraph, **kwargs)
        return self

    def make_thunk(self, **kwargs):
        run, input_storage, output_storage = self.linker.make_thunk(**kwargs)
        wrapper = self.wrapper
        thunks = run.thunks

        def wrapped_run():
            for thunk in thunks:
                wrapper(self.fgraph, thunk, thunk.node)
            return [s[0] for s in run.output_storage]

        wrapped_run.storage_map = run.storage_map
        wrapped_run.thunks = thunks
        wrapped_run.input_storage = input_storage
        wrapped_run.output_storage = output_storage
        return wrapped_run, input_storage, output_storage
