"""Function: the compiled callable runtime.

Parallels /root/reference/pytensor/compile/executor.py (Function:40,
__call__:651): fill inputs -> run the linked executable -> write shared
updates back -> return outputs.  On the XLA path the "VM" is one jitted
call whose shared arguments are donated device buffers, so NUTS-style
inner loops never leave the chip (SURVEY §3.3: per-call overhead is the
latency floor — trust_input + device-resident shared state address it).
"""

from __future__ import annotations

import time
from typing import Any, Sequence

import numpy as np

from pytensor_tpu.config import config
from pytensor_tpu.link.basic import PerformLinker
from pytensor_tpu.link.xla.linker import XlaLinker


class AliasedMemoryError(Exception):
    """Output buffers alias each other or an input unexpectedly
    (reference compile/executor.py:29)."""


class Function:
    def __init__(self, linker, fgraph, explicit_inputs, shared_vars, update_pairs,
                 n_user_outputs, unpack_single, name=None, trust_input=False,
                 profile=False, mode=None):
        self.linker = linker
        self.fgraph = fgraph
        self.maker = self  # reference-compat alias (f.maker.fgraph)
        self.explicit_inputs = explicit_inputs
        self.shared_vars = shared_vars
        self.update_pairs = update_pairs
        self.n_user_outputs = n_user_outputs
        self.unpack_single = unpack_single
        self.name = name
        self.trust_input = trust_input
        self.profile = profile
        self.mode = mode
        self.call_count = 0
        self.call_time = 0.0
        self.compile_time = 0.0
        self.rewrite_time = 0.0

        self._containers = [sv.container for sv in shared_vars]
        # positions of updated shared inputs (for donation)
        upd_shared = {id(k) for k, _ in update_pairs}
        n_explicit = len(explicit_inputs)
        self._update_out_start = n_user_outputs
        self._updated_containers = [
            shared_vars[i].container
            for i in range(len(shared_vars))
            if id(shared_vars[i]) in upd_shared
        ]
        # map update outputs -> containers in pair order
        self._update_containers_ordered = [k.container for k, _ in update_pairs]

        self._input_types = [wi.variable.type for wi in explicit_inputs]
        self._input_names = {}
        for idx, wi in enumerate(explicit_inputs):
            if wi.name:
                self._input_names[wi.name] = idx

        if isinstance(linker, XlaLinker):
            if hasattr(linker, "resolve_in_shardings"):
                linker.resolve_in_shardings(
                    [wi.variable for wi in explicit_inputs] + list(shared_vars)
                )
            donate = ()
            if config.xla__donate_updates:
                donate = tuple(
                    n_explicit + i
                    for i, sv in enumerate(shared_vars)
                    if id(sv) in upd_shared
                )
            self.vm = linker.make_jax_fn(donate_argnums=donate)
            self._backend = "xla"
        else:
            run, input_storage, output_storage = linker.make_thunk()
            self._run = run
            self._input_storage = input_storage
            self._output_storage = output_storage

            def vm(*vals):
                for s, v in zip(input_storage, vals):
                    s[0] = v
                res = run()
                # clear input cells so we don't pin memory
                return tuple(res)

            self.vm = vm
            self._backend = "py"

    # --- value access -------------------------------------------------------
    def __contains__(self, item):
        return item in self._input_names

    def __call__(self, *args, **kwargs):
        t0 = time.perf_counter() if self.profile else 0.0
        n_expected = len(self.explicit_inputs)
        if kwargs or len(args) < n_expected:
            args = list(args) + [None] * (n_expected - len(args))
            for k, v in kwargs.items():
                if k not in self._input_names:
                    raise TypeError(f"unknown input name {k!r}")
                args[self._input_names[k]] = v
            # unset positions fall back to In(value=...) defaults
            for i, (a, wi) in enumerate(zip(args, self.explicit_inputs)):
                if a is None and getattr(wi, "value", None) is not None:
                    args[i] = wi.value
            if any(a is None for a in args):
                missing = [self.explicit_inputs[i].variable
                           for i, a in enumerate(args) if a is None]
                raise TypeError(
                    f"missing input value(s) for {missing} (no default)")
        if len(args) != n_expected:
            raise TypeError(f"expected {n_expected} inputs, got {len(args)}")
        if self.trust_input:
            vals = list(args)
        else:
            vals = []
            for a, t, wi in zip(args, self._input_types, self.explicit_inputs):
                try:
                    if self._backend == "xla" and not isinstance(a, np.ndarray):
                        # allow device arrays straight through if type-compatible
                        import jax

                        if isinstance(a, jax.Array):
                            vals.append(a)
                            continue
                    v = t.filter(a, strict=wi.strict,
                                 allow_downcast=wi.allow_downcast)
                    if self._backend == "xla" and hasattr(t, "xla_typify"):
                        v = t.xla_typify(v)
                    vals.append(v)
                except Exception as e:
                    raise TypeError(
                        f"Bad input argument for {wi.variable}: {e}"
                    ) from e
        shared_vals = [c.storage[0] for c in self._containers]
        results = self.vm(*vals, *shared_vals)
        if not isinstance(results, tuple):
            results = (results,)
        results = list(results)
        # while-scan executed-prefix outputs: the XLA graph returns the
        # full zero-padded buffer plus steps_done; cut host-side after the
        # fetch (scan/dynlen.py WhileScanDynLen records the spec)
        dynlen = getattr(self.fgraph, "dynlen_output_spec", None)
        if dynlen:
            for out_idx, k_idx in dynlen.items():
                results[out_idx] = results[out_idx][: int(results[k_idx])]
        outputs = list(results[: self.n_user_outputs])
        updates = results[self.n_user_outputs:]
        for c, v in zip(self._update_containers_ordered, updates):
            c.storage[0] = v
        if self._backend == "py":
            # host outputs: return copies so later calls can't alias
            outputs = [o for o in outputs]
        self.call_count += 1
        if self.profile:
            self.call_time += time.perf_counter() - t0
        if self.unpack_single and len(outputs) == 1:
            return outputs[0]
        if self.n_user_outputs == 0:
            return []
        return outputs

    def copy(self, share_memory=False, swap=None, delete_updates=False,
             name=None):
        """Recompile the function, sharing (or swapping) shared variables.

        swap: {old_shared: new_shared} substitutions applied to the graph.
        """
        from pytensor_tpu.compile.maker import function
        from pytensor_tpu.graph.replace import graph_replace

        spec = self._spec
        outputs = list(spec["outputs"])
        updates = {k: v for k, v in spec["updates"]} if not delete_updates else None
        if not share_memory and self.shared_vars:
            # the copy gets its OWN shared containers (value snapshots);
            # share_memory=True keeps aliasing the originals
            import copy as _copy

            from pytensor_tpu.compile.sharedvalue import shared as _shared

            auto = {}
            for sv in self.shared_vars:
                if swap and sv in swap:
                    continue
                auto[sv] = _shared(_copy.deepcopy(sv.get_value()),
                                   name=sv.name)
            swap = {**auto, **(swap or {})}
        if swap:
            exprs = outputs + (list(updates.values()) if updates else [])
            exprs = graph_replace(exprs, swap, strict=False) if exprs else exprs
            outputs = exprs[: len(outputs)]
            if updates:
                updates = {
                    swap.get(k, k): v
                    for k, v in zip(updates.keys(), exprs[len(outputs):])
                }
        out_arg = outputs[0] if spec["unpack_single"] and len(outputs) == 1 \
            else outputs
        return function(spec["inputs"], out_arg, updates=updates,
                        mode=self.mode, name=name or spec["name"],
                        trust_input=spec["trust_input"],
                        on_unused_input="ignore")

    def __reduce__(self):
        spec = self._spec
        out_arg = spec["outputs"][0] if spec["unpack_single"] and \
            len(spec["outputs"]) == 1 else spec["outputs"]
        payload = dict(
            inputs=spec["inputs"], outputs=out_arg,
            updates={k: v for k, v in spec["updates"]},
            name=spec["name"], trust_input=spec["trust_input"],
            mode=spec.get("mode"),
        )
        return (_rebuild_function, (payload,))

    def free(self):
        if self._backend == "py":
            for s in self._run.storage_map.values():
                s[0] = None

    def dprint(self, **kwargs):
        from pytensor_tpu.printing import debugprint

        return debugprint(self.fgraph, **kwargs)

    def get_shared(self):
        return list(self.shared_vars)

    def __str__(self):
        return f"Function({self.name or 'anonymous'}, backend={self._backend})"


def _rebuild_function(payload):
    from pytensor_tpu.compile.maker import function

    return function(payload["inputs"], payload["outputs"],
                    updates=payload["updates"] or None, name=payload["name"],
                    trust_input=payload["trust_input"], mode=payload.get("mode"),
                    on_unused_input="ignore")
