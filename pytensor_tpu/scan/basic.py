"""The scan() user API.

Parallels /root/reference/pytensor/scan/basic.py (scan:164): classify the
step function's recurrences into sequences / mit-sot / sit-sot / nit-sot /
non-sequences, build the inner graph by calling the step function on
symbolic slices, and wrap it in a Scan op.  While-loops via
``scan.utils.until``.
"""

from __future__ import annotations

from typing import Callable, Sequence

import numpy as np

from pytensor_tpu.graph.basic import Constant, Variable
from pytensor_tpu.graph.fg import FunctionGraph
from pytensor_tpu.graph.traversal import graph_inputs
from pytensor_tpu.scan.op import Scan, ScanInfo
from pytensor_tpu.scan.utils import until
from pytensor_tpu.tensor.basic import as_tensor_variable
from pytensor_tpu.tensor.type import TensorType
from pytensor_tpu.updates import OrderedUpdates


def scan(
    fn: Callable,
    sequences=None,
    outputs_info=None,
    non_sequences=None,
    n_steps=None,
    truncate_gradient: int = -1,
    go_backwards: bool = False,
    mode=None,
    name: str | None = None,
    profile=False,
    allow_gc=None,
    strict: bool = False,
    return_list: bool = False,
    unroll: int | None = None,
    return_updates: bool = True,
):
    """Loop ``fn`` over sequences/recurrences; returns (outputs, updates).

    ``unroll`` (or ``config.scan__unroll``) replicates the compiled loop
    body, amortizing TPU per-iteration overhead for small bodies."""
    from pytensor_tpu.tensor.subtensor import flip

    sequences = _listify(sequences)
    outputs_info = _listify(outputs_info)
    non_sequences = _listify(non_sequences)

    # normalize sequences; dict form may carry taps, desugared into
    # shifted plain sequences (seq tap k at step t reads s[t - lo + k])
    seq_vars = []
    seq_lengths = []  # usable-length expr, one per ORIGINAL sequence

    from pytensor_tpu.tensor.shape import shape as _shape_of

    for s in sequences:
        taps = [0]
        if isinstance(s, dict):
            taps = list(s.get("taps") or [0])
            s = s["input"]
        sv = as_tensor_variable(s)
        if go_backwards:
            sv = flip(sv, 0)
        if taps == [0]:
            seq_vars.append(sv)
            seq_lengths.append(_shape_of(sv)[0])
            continue
        lo = min(min(taps), 0)
        hi = max(max(taps), 0)
        usable = _shape_of(sv)[0] - int(hi - lo)
        seq_lengths.append(usable)
        for tap in taps:
            start = tap - lo
            view = sv[start:] if hi - lo == 0 else sv[start: start + usable]
            seq_vars.append(view)

    # n_steps: explicit, or the SHORTEST sequence's usable length (reference
    # scan/basic.py: all sequences are truncated to the number of steps
    # before the loop; tests test_grad_multiple_seqs_different_nsteps)
    from pytensor_tpu.tensor.math import minimum as _tm_minimum

    if n_steps is None:
        if not seq_vars:
            raise ValueError("scan needs sequences or n_steps")
        n_steps_var = seq_lengths[0]
        for ln in seq_lengths[1:]:
            n_steps_var = _tm_minimum(n_steps_var, ln)
        explicit_n_steps = False
    else:
        n_steps_var = as_tensor_variable(n_steps)
        explicit_n_steps = True

    # clip each sequence view to exactly n_steps rows so downstream
    # machinery (pushout rewrites, the gradient's reversal) sees
    # consistent lengths; skip when the length is already exact
    if seq_vars and (explicit_n_steps or len(seq_lengths) > 1):
        from pytensor_tpu.tensor.basic import (
            NotScalarConstantError as _NSC,
        )
        from pytensor_tpu.tensor.basic import (
            get_scalar_constant_value as _get_const,
        )

        try:
            _static_n = int(_get_const(n_steps_var))
        except _NSC:
            _static_n = None
        clipped = []
        for sv in seq_vars:
            if _static_n is not None:
                if sv.type.shape[0] == _static_n:
                    clipped.append(sv)
                else:
                    clipped.append(sv[:_static_n])
            else:
                clipped.append(sv[:n_steps_var])
        seq_vars = clipped

    # normalize outputs_info
    states = []  # (initial, taps) or None for nit-sot
    for oi in outputs_info:
        if oi is None:
            states.append(None)
        elif isinstance(oi, dict):
            if oi.get("initial") is None:
                states.append(None)
            else:
                # taps keep the USER's order: the inner function receives
                # its tap arguments in the order listed (reference
                # scan/basic.py passes mit-sot slices as given)
                taps = tuple(oi.get("taps", [-1]))
                if any(t >= 0 for t in taps):
                    raise ValueError("output taps must be negative")
                if len(set(taps)) != len(taps):
                    raise ValueError(f"repeated output taps {taps}")
                states.append((as_tensor_variable(oi["initial"]), taps))
        else:
            states.append((as_tensor_variable(oi), (-1,)))

    non_seq_vars = [
        v if isinstance(v, Variable) else as_tensor_variable(v)
        for v in non_sequences
    ]

    def _is_updates(x):
        if isinstance(x, (dict, OrderedUpdates)):
            return True
        return (
            isinstance(x, (list, tuple))
            and len(x) > 0
            and all(
                isinstance(p, (tuple, list)) and len(p) == 2
                and isinstance(p[0], Variable)
                for p in x
            )
        )

    # --- build inner input variables, call fn ONCE, parse; when an inner
    # output dtype upcasts past the initial's dtype, the traced graph is
    # CLONED with widened tap variables instead of re-invoking fn (which
    # may have side effects: RandomStream shared creation, python
    # counters — reference scan/op.py reconciles via copy_var_format)
    state_dtype_override: dict[int, str] = {}
    from pytensor_tpu.scalar.basic import upcast as _upcast

    def _build_taps():
        taps_groups = []
        rec = 0
        for idx, st in enumerate(states):
            if st is None:
                continue
            init, taps = st
            dt = state_dtype_override.get(rec, init.type.dtype)
            m = -min(taps)
            if m == 1 and len(taps) == 1:
                core_type = TensorType(dt, init.type.shape)
            else:
                core_type = TensorType(dt, init.type.shape[1:])
            taps_groups.append(
                [core_type(f"state{idx}[t{tap}]") for tap in taps])
            rec += 1
        return taps_groups

    for _attempt in range(4):
        if _attempt == 0:
            inner_seqs = []
            for s in seq_vars:
                styp = TensorType(s.type.dtype, s.type.shape[1:])
                inner_seqs.append(styp(f"{s.name or 'seq'}[t]"))
            inner_taps = _build_taps()
            recurrent_idx = [i for i, st in enumerate(states)
                             if st is not None]
            # non-sequences are passed to fn as the OUTER variables (the
            # reference does the same: scan/basic.py:808 `args = inner_seqs
            # + ordered_args + non_seqs`, placeholders swapped in by
            # clone_replace at :1066).  This keeps outer-graph connectivity
            # visible at trace time — e.g. grad(gy[i], x) inside the body
            # where gy = grad(y, x) was built outside (reference
            # test_basic.py test_inner_grad) — and the post-trace clone
            # below rebinds them to fresh inner placeholders.
            inner_non_seqs = []

            # --- call the user fn (exactly once)
            args = list(inner_seqs)
            for group in inner_taps:
                args.extend(group)
            args.extend(non_seq_vars)
            raw = fn(*args)
        else:
            # dtype reconciliation pass: swap widened tap variables into
            # the already-traced graph (clone_with_new_inputs re-infers
            # every downstream type)
            from pytensor_tpu.graph.replace import graph_replace

            new_taps = _build_taps()
            mapping = [
                (old, new)
                for og, ng in zip(inner_taps, new_taps)
                for old, new in zip(og, ng)
                if old.type != new.type
            ]
            exprs = list(inner_outputs_user)
            n_user = len(exprs)
            upd_keys = list(explicit_updates)
            exprs += [explicit_updates[k] for k in upd_keys]
            if condition is not None:
                exprs.append(condition)
            repl = graph_replace(exprs, mapping, strict=False) \
                if mapping else exprs
            inner_outputs_user = list(repl[:n_user])
            for k, v in zip(upd_keys, repl[n_user:n_user + len(upd_keys)]):
                explicit_updates[k] = v
            if condition is not None:
                condition = repl[-1]
            inner_taps = new_taps

        if _attempt == 0:
            condition = None
            explicit_updates = OrderedUpdates()

            def _collect_updates(u):
                pairs = u.items() \
                    if isinstance(u, (dict, OrderedUpdates)) else u
                for k, v in pairs:
                    # only coerce values whose TARGET is tensor-typed; RNG
                    # (and other non-tensor) updates keep the original
                    # Variable
                    if isinstance(getattr(k, "type", None), TensorType):
                        explicit_updates[k] = as_tensor_variable(v)
                    elif isinstance(v, Variable):
                        explicit_updates[k] = v
                    else:
                        raise TypeError(
                            f"scan update for {k} must be a symbolic "
                            f"Variable of type {getattr(k, 'type', None)}, "
                            f"got {v!r}")

            if isinstance(raw, (dict, OrderedUpdates)) or (
                _is_updates(raw) and not isinstance(raw, tuple)
            ):
                # fn returned only an updates mapping
                outputs_raw = []
                _collect_updates(raw)
            elif isinstance(raw, tuple) and len(raw) in (2, 3) and (
                isinstance(raw[-1], until) or _is_updates(raw[-1])
                or (len(raw) == 3)
            ) and not all(isinstance(r, Variable) for r in raw):
                # forms: (outputs, updates), (outputs, until),
                # (outputs, updates, until)
                outputs_raw = raw[0]
                for extra in raw[1:]:
                    if isinstance(extra, until):
                        condition = extra.condition
                    elif _is_updates(extra) or isinstance(
                            extra, (dict, OrderedUpdates)):
                        _collect_updates(extra)
                    else:
                        raise TypeError(
                            f"unexpected scan fn return component {extra}")
            elif isinstance(raw, until):
                outputs_raw = []
                condition = raw.condition
            else:
                outputs_raw = raw
            inner_outputs_user = _listify(outputs_raw)
            inner_outputs_user = [
                as_tensor_variable(o) for o in inner_outputs_user]

        n_outs = len(inner_outputs_user)
        if outputs_info and len(states) != n_outs:
            raise ValueError(
                f"scan fn returned {n_outs} outputs but outputs_info has {len(states)}"
            )
        if not outputs_info:
            states = [None] * n_outs

        # order inner outputs: recurrent states first, then nit-sot
        state_outs = [inner_outputs_user[i] for i, st in enumerate(states) if st is not None]
        nit_outs = [inner_outputs_user[i] for i, st in enumerate(states) if st is None]
        taps_list = tuple(tuple(st[1]) for st in states if st is not None)
        inits = [st[0] for st in states if st is not None]

        # type check: recurrent outputs must match tap core types
        flat_tap_vars = [tv for group in inner_taps for tv in group]
        retry = False
        for (i, out), group in zip(
            [(k, o) for k, o in enumerate(state_outs)], inner_taps
        ):
            core = group[0]
            if out.type.ndim != core.type.ndim:
                raise TypeError(
                    f"scan state {i}: output type {out.type} incompatible with "
                    f"initial/tap type {core.type}"
                )
            if out.type.dtype != core.type.dtype:
                if _upcast(core.type.dtype, out.type.dtype) == out.type.dtype:
                    state_dtype_override[i] = out.type.dtype
                    retry = True
                else:
                    raise TypeError(
                        f"scan state {i}: inner function downcasts the state "
                        f"from {out.type.dtype} given initial dtype "
                        f"{core.type.dtype}; cast the initial state explicitly"
                    )
        if not retry:
            break
    else:
        raise TypeError("scan could not reconcile state dtypes with fn outputs")

    # upcast the outer initials whose state dtype was widened by fn
    if state_dtype_override:
        from pytensor_tpu.tensor.basic import cast as _cast

        inits = [
            _cast(init, state_dtype_override[i]) if i in state_dtype_override
            else init
            for i, init in enumerate(inits)
        ]

    inner_inputs = inner_seqs + flat_tap_vars + inner_non_seqs
    inner_outputs = state_outs + nit_outs + ([condition] if condition is not None else [])

    # implicit non-sequences: anything else the inner graph references that
    # belongs to the OUTER graph (closure variables).  Shared RNGs consumed
    # by RandomVariable nodes become *untraced states* (reference "untraced
    # sit-sot"): the key threads through the loop and the final key is
    # returned as an update for the shared variable.
    from pytensor_tpu.compile.sharedvalue import SharedVariable
    from pytensor_tpu.graph.fg import MissingInputError
    from pytensor_tpu.tensor.random.op import RandomVariable
    from pytensor_tpu.tensor.random.type import RandomGeneratorType

    upd_targets = list(explicit_updates.keys())
    upd_target_set = set(upd_targets)
    for t in upd_targets:
        if not isinstance(t, SharedVariable):
            raise TypeError(
                f"scan updates must target SharedVariables, got {t}"
            )
    upd_exprs = [explicit_updates[k] for k in upd_targets]

    # explicit non-sequences block the traversal: the traced graph embeds
    # the OUTER variables, and anything behind them belongs to the outer
    # graph, not the loop body (it reaches the body through the non-seq)
    explicit_ns_set = set(non_seq_vars)
    output_roots = set(graph_inputs(inner_outputs, blockers=non_seq_vars))
    implicit = []
    inner_set = set(inner_inputs)
    for v in graph_inputs(inner_outputs + upd_exprs, blockers=non_seq_vars):
        if isinstance(v, Constant):
            continue
        if v in explicit_ns_set:
            continue  # explicit non-sequence: placeholder swapped below
        if v not in inner_set and v not in implicit:
            if (v.owner is None and not isinstance(v, SharedVariable)
                    and v not in output_roots):
                # a root outer variable reachable ONLY through an update
                # expression (reference scan/basic.py raises via
                # construct_function_ins_and_outs; roots feeding outputs
                # are pulled in as implicit non-sequences instead,
                # cf. reference test_condition_hidden_inp)
                raise MissingInputError(
                    f"Undeclared input {v} used by the scan inner function.\n"
                    "Please pass this variable to the scan's inner function. "
                    "Do not forget to also pass it to the `non_sequences` "
                    "attribute of scan."
                )
            if strict and v not in upd_target_set:
                # the reference raises MissingInputError for strict-mode
                # violations (scan/basic.py strict=True; pinned by
                # tests/scan/test_basic.py test_strict_mode)
                raise MissingInputError(
                    f"scan(strict=True): implicit input {v}")
            implicit.append(v)

    rng_implicit = [
        v for v in implicit
        if isinstance(v, SharedVariable)
        and isinstance(v.type, RandomGeneratorType)
        and v not in upd_target_set
    ]
    implicit = [
        v for v in implicit if v not in rng_implicit and v not in upd_target_set
    ]

    untraced_inits = []
    inner_untraced_in = []
    inner_untraced_out = []
    upd_state_targets = []  # tensor-typed update targets -> traced states
    upd_state_in = []
    upd_state_out = []
    if rng_implicit or implicit or upd_targets or non_seq_vars:
        from pytensor_tpu.graph.basic import clone_get_equiv

        ns_placeholders = [v.type(f"{v.name or 'w'}") for v in non_seq_vars]
        placeholders = [v.type() for v in implicit]
        rng_placeholders = [v.type() for v in rng_implicit]
        upd_placeholders = [v.type() for v in upd_targets]
        memo = dict(zip(
            non_seq_vars + implicit + rng_implicit + upd_targets,
            ns_placeholders + placeholders + rng_placeholders
            + upd_placeholders))
        memo = clone_get_equiv(
            inner_inputs + non_seq_vars + implicit + rng_implicit
            + upd_targets,
            inner_outputs + upd_exprs,
            copy_inputs=False, copy_orphans=False, memo=memo,
        )
        inner_outputs = [memo[o] for o in inner_outputs]
        upd_exprs = [memo.get(e, e) for e in upd_exprs]
        inner_inputs = ([memo.get(i, i) for i in inner_inputs]
                        + ns_placeholders + placeholders)
        non_seq_vars = non_seq_vars + implicit
        inner_non_seqs = ns_placeholders + placeholders
        # explicit shared-variable updates: tensor-typed targets thread as
        # ordinary TRACED sit-sot states (so gradients flow through them —
        # reference scan threads them as sit-sots; the updates mapping
        # reads trace[-1], and the trace-window rewrite recovers the O(1)
        # memory when nothing else reads the trace).  Non-tensor targets
        # (RNG generators, ...) stay untraced carries.
        for sv, ph, ex in zip(upd_targets, upd_placeholders, upd_exprs):
            if isinstance(sv.type, TensorType):
                upd_state_targets.append(sv)
                upd_state_in.append(ph)
                upd_state_out.append(ex)
            else:
                untraced_inits.append(sv)
                inner_untraced_in.append(ph)
                inner_untraced_out.append(ex)
        # for each rng placeholder, the next_rng output of its consumer
        # RandomVariable node is the state transition
        from pytensor_tpu.graph.traversal import applys_between

        for sv, ph in zip(rng_implicit, rng_placeholders):
            next_rng = None
            for node in applys_between([], inner_outputs + [
                o for n2 in applys_between([ph], inner_outputs)
                for o in n2.outputs
            ]):
                if isinstance(node.op, RandomVariable) and node.inputs[0] is ph:
                    next_rng = node.outputs[0]
                    break
            if next_rng is None:
                # rng used by something other than an RV: treat as invariant
                non_seq_vars.append(sv)
                inner_non_seqs.append(ph)
                inner_inputs.append(ph)
                continue
            untraced_inits.append(sv)
            inner_untraced_in.append(ph)
            inner_untraced_out.append(next_rng)

    n_user_states = len([st for st in states if st is not None])
    full_taps_list = taps_list + tuple((-1,) for _ in upd_state_targets)
    info = ScanInfo(
        n_seqs=len(seq_vars),
        taps=full_taps_list,
        n_nit_sot=len(nit_outs),
        n_non_seqs=len(non_seq_vars),
        as_while=condition is not None,
        n_untraced=len(inner_untraced_in),
    )
    # assemble in canonical order: seqs + taps (user states, then update
    # states) + untraced + non_seqs
    n_tapvars = sum(len(t) for t in taps_list)
    base_inputs = inner_inputs[: info.n_seqs + n_tapvars]
    nonseq_inputs = inner_inputs[info.n_seqs + n_tapvars:]
    inner_inputs = (base_inputs + upd_state_in + inner_untraced_in
                    + nonseq_inputs)
    # outputs: states (user, then update) + untraced + nit (+ cond)
    cond_tail = inner_outputs[-1:] if condition is not None else []
    body_outputs = inner_outputs[: len(inner_outputs) - len(cond_tail)]
    state_part = body_outputs[: n_user_states]
    nit_part = body_outputs[n_user_states:]
    inner_outputs = (state_part + upd_state_out + inner_untraced_out
                     + nit_part + cond_tail)
    fgraph = FunctionGraph(inner_inputs, inner_outputs, clone=True)
    op = Scan(fgraph, info, name=name, truncate_gradient=truncate_gradient,
              unroll=unroll)
    node_outs = op(n_steps_var, *seq_vars, *inits, *upd_state_targets,
                   *untraced_inits, *non_seq_vars)
    if not isinstance(node_outs, list):
        node_outs = [node_outs]
    steps_out = node_outs[-1] if info.as_while else None

    def _as_prefix(trace):
        """The user-visible executed prefix of a while-scan trace."""
        if steps_out is None:
            return trace
        from pytensor_tpu.scan.dynlen import truncate_to_done

        return truncate_to_done(trace, steps_out)

    updates = OrderedUpdates()
    untraced_pos = {id(sv): u for u, sv in enumerate(untraced_inits)}
    upd_state_pos = {id(sv): n_user_states + j
                     for j, sv in enumerate(upd_state_targets)}
    for sv in upd_targets:
        if id(sv) in upd_state_pos:
            updates[sv] = _as_prefix(node_outs[upd_state_pos[id(sv)]])[-1]
        else:
            updates[sv] = node_outs[info.n_states + untraced_pos[id(sv)]]
    for sv in untraced_inits:
        if sv not in updates:
            updates[sv] = node_outs[info.n_states + untraced_pos[id(sv)]]

    # map back to the user's output order
    traces = {}
    ri = 0
    ni = 0
    for i, st in enumerate(states):
        if st is not None:
            traces[i] = _as_prefix(node_outs[ri])
            ri += 1
    nit_base = info.n_states + info.n_untraced
    for i, st in enumerate(states):
        if st is None:
            traces[i] = _as_prefix(node_outs[nit_base + ni])
            ni += 1
    results = [traces[i] for i in range(len(states))]
    if len(results) == 1 and not return_list:
        results = results[0]
    if not return_updates:
        # forward-compat with the reference's new scan signature
        # (reference scan/basic.py _manage_output_api_change): silently
        # dropping non-empty updates would leave shared RNG state never
        # advanced by the loop, so this is an error, not a convenience.
        if len(updates):
            raise ValueError(
                "scan(..., return_updates=False) but the inner function "
                "produced non-empty updates (e.g. RNG state). Either use "
                "return_updates=True and pass the updates to `function`, "
                "or handle the recurrent state explicitly via outputs_info."
            )
        return results
    return results, updates


def _listify(x):
    if x is None:
        return []
    if isinstance(x, (list, tuple)):
        return list(x)
    return [x]
