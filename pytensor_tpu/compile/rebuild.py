"""Graph rebuilding for function compilation.

Parallels /root/reference/pytensor/compile/rebuild.py
(rebuild_collect_shared:24): clone a user graph applying ``replace``
(givens), discover shared variables and default updates.  The function
pipeline (compile/maker.py) uses this logic inline; this module exposes
it standalone for downstream users (PyMC-style model manipulation).
"""

from __future__ import annotations

from pytensor_tpu.compile.sharedvalue import SharedVariable
from pytensor_tpu.graph.basic import Variable, clone_get_equiv
from pytensor_tpu.graph.traversal import graph_inputs


def rebuild_collect_shared(
    outputs,
    inputs=None,
    replace=None,
    updates=None,
    rebuild_strict=True,
    copy_inputs_over=True,
    no_default_updates=False,
):
    """Clone ``outputs`` applying ``replace``; collect shared variables and
    updates.  Returns (inputs, cloned_outputs,
    [clone_map, shared_inputs, shared_updates])."""
    one = isinstance(outputs, Variable)
    outputs_list = [outputs] if one else list(outputs or [])
    inputs = list(inputs or [])
    replace_items = list(replace.items()) if isinstance(replace, dict) \
        else list(replace or [])
    update_items = list(updates.items()) if isinstance(updates, dict) \
        else list(updates or [])

    from pytensor_tpu.graph.replace import graph_replace

    if replace_items:
        outputs_list = graph_replace(outputs_list, replace_items, strict=False) \
            if outputs_list else outputs_list

    shared_inputs: list[SharedVariable] = []
    seen = set()

    def discover(vs):
        for v in graph_inputs(vs):
            if isinstance(v, SharedVariable) and v not in seen:
                seen.add(v)
                shared_inputs.append(v)

    exprs = outputs_list + [u for _, u in update_items]
    if exprs:
        discover(exprs)
    for k, _ in update_items:
        if k not in seen:
            seen.add(k)
            shared_inputs.append(k)
    shared_updates = dict(update_items)
    if not no_default_updates:
        for sv in list(shared_inputs):
            du = getattr(sv, "default_update", None)
            if du is not None and sv not in shared_updates:
                shared_updates[sv] = du
                discover([du])

    all_inputs = inputs + shared_inputs
    memo = clone_get_equiv(all_inputs, exprs, copy_inputs=copy_inputs_over,
                           copy_orphans=False)
    cloned_inputs = [memo.get(i, i) for i in all_inputs]
    cloned_outputs = [memo.get(o, o) for o in outputs_list]
    cloned_updates = {
        k: memo.get(v, v) for k, v in shared_updates.items()
    }
    if one and cloned_outputs:
        cloned_out = cloned_outputs[0]
    else:
        cloned_out = cloned_outputs
    return cloned_inputs, cloned_out, [memo, shared_inputs, cloned_updates]
