"""Scan rewrites.

Parallels /root/reference/pytensor/scan/rewriting/ (push_out.py, io.py,
trace.py, merge.py).  Delegation to XLA is verified by optimized-HLO
inspection (tests/test_scan_hlo_evidence.py; PARITY appendix "Scan
rewrite delegation"):

- CONFIRMED subsumed: unused ys traces are DCE'd out of the while carry;
  loop-invariant computation is hoisted to the while init (LICM).  The
  graph-level scan_remove_unused_outputs / scan_push_out_non_seqs still
  run — shrinking the traced body cuts compile time — but correctness
  and memory do not depend on them.
- NOT subsumed (ported here): buffer truncation for tail-window reads
  (scan_truncate_trace_window — XLA keeps the full (n, ...) ys buffer
  when only ys[-w:] is consumed) and accumulator push-out
  (scan_push_out_add — XLA cannot turn T sequential adds into one
  batched reduction).
"""

from __future__ import annotations

import numpy as np

from pytensor_tpu.compile.mode import optdb
from pytensor_tpu.graph.rewriting.basic import (GraphRewriter, WalkingGraphRewriter, node_rewriter)
from pytensor_tpu.scan.op import Scan, ScanInfo
from pytensor_tpu.tensor.basic import (NotScalarConstantError, get_scalar_constant_value)


@node_rewriter([Scan])
def scan_remove_unused_outputs(fgraph, node):
    """Rebuild Scan without nit-sot outputs that have no clients."""
    op = node.op
    info = op.info
    if info.n_nit_sot == 0 or info.as_while:
        return False
    used = [bool(fgraph.clients.get(o)) for o in node.outputs]
    # output order: states, untraced finals, nit-sot traces
    nit_start = info.n_states + info.n_untraced
    drop = [k for k in range(info.n_nit_sot) if not used[nit_start + k]]
    if not drop:
        return False
    keep_nit = [k for k in range(info.n_nit_sot) if k not in drop]
    inner_outputs = (
        op.inner_state_outs()
        + list(op.inner_untraced_outs())
        + [op.inner_nit_sot_outs()[k] for k in keep_nit]
    )
    from pytensor_tpu.graph.fg import FunctionGraph

    new_info = ScanInfo(
        n_seqs=info.n_seqs,
        taps=info.taps,
        n_nit_sot=len(keep_nit),
        n_non_seqs=info.n_non_seqs,
        as_while=False,
        n_untraced=info.n_untraced,
    )
    new_fg = FunctionGraph(list(op.fgraph.inputs), list(inner_outputs), clone=True)
    new_op = Scan(new_fg, new_info, name=op.name,
                  truncate_gradient=op.truncate_gradient,
                  unroll=getattr(op, "unroll", None))
    new_outs = new_op(*node.inputs)
    if not isinstance(new_outs, list):
        new_outs = [new_outs]
    # map old outputs -> new (dropped ones keep the old var; they have no
    # clients so the replacement list skips them)
    repl = []
    for k in range(info.n_states):
        repl.append((node.outputs[k], new_outs[k]))
    for u in range(info.n_untraced):
        repl.append((node.outputs[info.n_states + u],
                     new_outs[info.n_states + u]))
    j = info.n_states + info.n_untraced
    for k in keep_nit:
        repl.append((node.outputs[nit_start + k], new_outs[j]))
        j += 1
    return dict(repl)


optdb.register(
    "scan_remove_unused_outputs",
    WalkingGraphRewriter(scan_remove_unused_outputs),
    "fast_run", "scan",
    position=1.605,  # reference scan_remove_unused_top position
)


def _last_index_clients_only(fgraph, node, out):
    """True iff every client of ``out`` is trace[-1] (or its canonicalized
    positive form trace[n-1] when n_steps is a constant)."""
    from pytensor_tpu.tensor.subtensor import Subtensor

    clients = fgraph.clients.get(out, ())
    if not clients:
        return False
    try:
        n_steps = int(get_scalar_constant_value(node.inputs[0]))
    except NotScalarConstantError:
        n_steps = None
    for c, _ in clients:
        if c == "output" or not isinstance(c.op, Subtensor):
            return False
        il = c.op.idx_list
        if len(il) != 1 or not isinstance(il[0], (int, np.integer)):
            return False
        e = int(il[0])
        if e != -1 and not (n_steps is not None and e == n_steps - 1):
            return False
    return True


@node_rewriter([Scan])
def scan_sit_sot_to_untraced(fgraph, node):
    """Convert sit-sot states whose trace is only read at [-1] into
    untraced states (reference scan/rewriting/trace.py:902): the loop then
    carries a single value instead of stacking an (n_steps, ...) buffer —
    the ScanSaveMem memory/bandwidth win.
    """
    import numpy as np

    from pytensor_tpu.tensor.subtensor import Subtensor

    op = node.op
    info = op.info
    if info.as_while:
        return False

    def only_last_element_clients(out):
        return _last_index_clients_only(fgraph, node, out)

    convert = []
    for k, taps in enumerate(info.taps):
        if taps == (-1,) and only_last_element_clients(node.outputs[k]):
            convert.append(k)
    if not convert:
        return False

    keep = [k for k in range(info.n_states) if k not in convert]
    # reorder inner inputs: seqs + kept taps + (converted taps + old untraced)
    n_seqs = info.n_seqs
    tap_groups = []
    pos = n_seqs
    for taps in info.taps:
        tap_groups.append(op.fgraph.inputs[pos: pos + len(taps)])
        pos += len(taps)
    old_untraced_in = op.inner_untraced_vars()
    non_seq_in = op.inner_non_seq_vars()
    new_inner_inputs = (
        list(op.fgraph.inputs[:n_seqs])
        + [v for k in keep for v in tap_groups[k]]
        + [tap_groups[k][0] for k in convert]
        + list(old_untraced_in)
        + list(non_seq_in)
    )
    state_outs = op.inner_state_outs()
    new_inner_outputs = (
        [state_outs[k] for k in keep]
        + [state_outs[k] for k in convert]
        + list(op.inner_untraced_outs())
        + list(op.inner_nit_sot_outs())
    )

    from pytensor_tpu.graph.fg import FunctionGraph

    new_info = ScanInfo(
        n_seqs=n_seqs,
        taps=tuple(info.taps[k] for k in keep),
        n_nit_sot=info.n_nit_sot,
        n_non_seqs=info.n_non_seqs,
        as_while=False,
        n_untraced=info.n_untraced + len(convert),
    )
    new_fg = FunctionGraph(new_inner_inputs, new_inner_outputs, clone=True)
    new_op = Scan(new_fg, new_info, name=op.name,
                  truncate_gradient=op.truncate_gradient,
                  unroll=getattr(op, "unroll", None))

    outer_inits = op.outer_inits(node.inputs)
    outer_untraced = op.outer_untraced_inits(node.inputs)
    outer_non_seqs = op.outer_non_seqs(node.inputs)
    new_outer = (
        list(op.outer_seqs(node.inputs))
        + [outer_inits[k] for k in keep]
        + [outer_inits[k] for k in convert]
        + list(outer_untraced)
        + list(outer_non_seqs)
    )
    new_outs = new_op(node.inputs[0], *new_outer)
    if not isinstance(new_outs, list):
        new_outs = [new_outs]

    # map: kept traces, then converted finals, old untraced finals, nits
    repl = []
    for j, k in enumerate(keep):
        repl.append((node.outputs[k], new_outs[j]))
    for j, k in enumerate(convert):
        final = new_outs[len(keep) + j]
        # replace every trace[-1] consumer with the final value
        for c, idx in list(fgraph.clients.get(node.outputs[k], ())):
            repl.append((c.outputs[0], final))
    base = len(keep) + len(convert)
    for u in range(info.n_untraced):
        repl.append((node.outputs[info.n_states + u], new_outs[base + u]))
    for m in range(info.n_nit_sot):
        repl.append((node.outputs[info.n_states + info.n_untraced + m],
                     new_outs[base + info.n_untraced + m]))
    return dict(repl)


optdb.register(
    "scan_sit_sot_to_untraced",
    WalkingGraphRewriter(scan_sit_sot_to_untraced),
    "fast_run", "scan", "scan_save_mem",
    position=1.62,  # reference position
)


@node_rewriter([Scan])
def scan_truncate_trace_window(fgraph, node):
    """Truncate a sit-sot trace consumed only through its last-w window
    (``trace[-w:]`` / ``trace[-j]``) to a rolling (w, ...) untraced carry
    (reference scan/rewriting/trace.py:887 buffer-truncation variants).

    XLA does NOT subsume this: the lax.scan ys stacking keeps the full
    (n_steps, ...) HBM buffer alive even when only a tail window is read
    (PARITY appendix, scan HLO evidence).  Requires a statically known
    n_steps >= w so the rolled window is fully populated.
    """
    import numpy as np

    from pytensor_tpu.tensor.subtensor import Subtensor

    op = node.op
    info = op.info
    if info.as_while:
        return False
    try:
        n_steps = int(get_scalar_constant_value(node.inputs[0]))
    except NotScalarConstantError:
        return False

    def window_need(out):
        """Max window length needed by the clients, or None if any client
        reads more than a constant tail."""
        clients = fgraph.clients.get(out, ())
        if not clients:
            return None
        w = 0
        for c, _ in clients:
            if c == "output" or not isinstance(c.op, Subtensor):
                return None
            il = c.op.idx_list
            if len(il) != 1:
                return None
            e = il[0]
            if isinstance(e, (int, np.integer)):
                # trace[-j] or its canonicalized trace[n-j]
                j = -int(e) if int(e) < 0 else n_steps - int(e)
                if j <= 0:
                    return None
                w = max(w, j)
            elif isinstance(e, tuple) and e[0] == "slice":
                a, b, s = e[1], e[2], e[3]
                if not isinstance(a, (int, np.integer)):
                    return None
                if b is not None or (s is not None and s != 1):
                    return None
                j = -int(a) if int(a) < 0 else n_steps - int(a)
                if j <= 0:
                    return None
                w = max(w, j)
            else:
                return None
        # w == 1 is scan_sit_sot_to_untraced's cheaper form
        return w if 2 <= w <= n_steps else None

    convert = {}
    for k, taps in enumerate(info.taps):
        if taps != (-1,):
            continue
        w = window_need(node.outputs[k])
        if w is not None:
            convert[k] = w
    if not convert:
        return False

    from pytensor_tpu.graph.fg import FunctionGraph
    from pytensor_tpu.graph.replace import clone_replace
    from pytensor_tpu.tensor import basic as tb
    from pytensor_tpu.tensor.basic import shape_padleft

    keep = [k for k in range(info.n_states) if k not in convert]
    n_seqs = info.n_seqs
    tap_groups = []
    pos = n_seqs
    for taps in info.taps:
        tap_groups.append(op.fgraph.inputs[pos: pos + len(taps)])
        pos += len(taps)

    # fresh (w, ...) window inputs; the old h_prev tap becomes win[-1]
    from pytensor_tpu.tensor.type import TensorType

    win_vars = {}
    tap_repl = {}
    for k, w in convert.items():
        tap_var = tap_groups[k][0]
        win = TensorType(tap_var.type.dtype,
                         (w,) + tuple(tap_var.type.shape))(f"win_{k}")
        win_vars[k] = win
        tap_repl[tap_var] = win[-1]

    state_outs = op.inner_state_outs()
    replaced = clone_replace(
        list(state_outs) + list(op.inner_untraced_outs())
        + list(op.inner_nit_sot_outs()),
        replace=tap_repl,
    )
    r_states = replaced[: info.n_states]
    r_untraced = replaced[info.n_states: info.n_states + info.n_untraced]
    r_nits = replaced[info.n_states + info.n_untraced:]

    # window output: shift left, append the new state value
    win_outs = {}
    for k, w in convert.items():
        h_new = r_states[k]
        win = win_vars[k]
        win_outs[k] = tb.join(0, win[1:], shape_padleft(h_new))

    old_untraced_in = op.inner_untraced_vars()
    non_seq_in = op.inner_non_seq_vars()
    new_inner_inputs = (
        list(op.fgraph.inputs[:n_seqs])
        + [v for k in keep for v in tap_groups[k]]
        + [win_vars[k] for k in convert]
        + list(old_untraced_in)
        + list(non_seq_in)
    )
    new_inner_outputs = (
        [r_states[k] for k in keep]
        + [win_outs[k] for k in convert]
        + list(r_untraced)
        + list(r_nits)
    )
    new_info = ScanInfo(
        n_seqs=n_seqs,
        taps=tuple(info.taps[k] for k in keep),
        n_nit_sot=info.n_nit_sot,
        n_non_seqs=info.n_non_seqs,
        as_while=False,
        n_untraced=info.n_untraced + len(convert),
    )
    new_fg = FunctionGraph(new_inner_inputs, new_inner_outputs, clone=True)
    new_op = Scan(new_fg, new_info, name=op.name,
                  truncate_gradient=op.truncate_gradient,
                  unroll=getattr(op, "unroll", None))

    outer_inits = op.outer_inits(node.inputs)
    outer_untraced = op.outer_untraced_inits(node.inputs)
    outer_non_seqs = op.outer_non_seqs(node.inputs)
    win_inits = []
    for k, w in convert.items():
        h0 = outer_inits[k]
        # contents are shifted out before the final window is read
        win_inits.append(tb.alloc(shape_padleft(h0), w, *[
            h0.shape[i] for i in range(h0.type.ndim)]))
    new_outer = (
        list(op.outer_seqs(node.inputs))
        + [outer_inits[k] for k in keep]
        + win_inits
        + list(outer_untraced)
        + list(outer_non_seqs)
    )
    new_outs = new_op(node.inputs[0], *new_outer)
    if not isinstance(new_outs, list):
        new_outs = [new_outs]

    repl = []
    for j, k in enumerate(keep):
        repl.append((node.outputs[k], new_outs[j]))
    conv_list = list(convert)
    for j, k in enumerate(conv_list):
        w = convert[k]
        final_win = new_outs[len(keep) + j]
        for c, _ in list(fgraph.clients.get(node.outputs[k], ())):
            e = c.op.idx_list[0]
            if isinstance(e, (int, np.integer)):
                j = -int(e) if int(e) < 0 else n_steps - int(e)
                repl.append((c.outputs[0], final_win[w - j]))
            else:
                a = int(e[1])
                j = -a if a < 0 else n_steps - a
                repl.append((c.outputs[0],
                             final_win if j == w else final_win[w - j:]))
    base = len(keep) + len(conv_list)
    for u in range(info.n_untraced):
        repl.append((node.outputs[info.n_states + u], new_outs[base + u]))
    for m in range(info.n_nit_sot):
        repl.append((node.outputs[info.n_states + info.n_untraced + m],
                     new_outs[base + info.n_untraced + m]))
    return dict(repl)


optdb.register(
    "scan_truncate_trace_window",
    WalkingGraphRewriter(scan_truncate_trace_window),
    "fast_run", "scan", "scan_save_mem",
    position=1.625,  # after sit-sot->untraced, same save-mem family
)


class ScanMerge(GraphRewriter):
    """Merge independent Scan nodes that share the same n_steps into one
    loop (reference scan/rewriting/merge.py): one lax.scan dispatch and a
    shared loop body instead of several."""

    name = "scan_merge"

    def apply(self, fgraph):
        from collections import defaultdict

        from pytensor_tpu.graph.traversal import ancestors

        merged = 0
        groups = defaultdict(list)
        for node in fgraph.toposort():
            if isinstance(node.op, Scan) and not node.op.info.as_while \
                    and node.op.truncate_gradient == -1:
                groups[id(node.inputs[0])].append(node)
        for nodes in groups.values():
            if len(nodes) < 2:
                continue
            # independence: no node's input depends on another node's output
            outs = {id(o): n for n in nodes for o in n.outputs}
            ok_nodes = []
            for n in nodes:
                deps = set(
                    id(a) for a in ancestors(n.inputs)
                )
                if any(oid in deps for oid in outs if outs[oid] is not n):
                    continue
                ok_nodes.append(n)
            if len(ok_nodes) < 2:
                continue
            try:
                self._merge(fgraph, ok_nodes)
                merged += 1
            except Exception:
                continue
        return merged

    def _merge(self, fgraph, nodes):
        from pytensor_tpu.graph.fg import FunctionGraph

        # graph_replace/clone can reuse the SAME Scan op instance across
        # nodes; listing its inner variables twice would collapse two
        # logical input slots into one.  Clone the op for repeats.
        seen = set()
        ops = []
        for n in nodes:
            op = n.op
            if id(op) in seen:
                op = op.clone_fresh()
            seen.add(id(op))
            ops.append(op)
        infos = [op.info for op in ops]
        new_info = ScanInfo(
            n_seqs=sum(i.n_seqs for i in infos),
            taps=tuple(t for i in infos for t in i.taps),
            n_nit_sot=sum(i.n_nit_sot for i in infos),
            n_non_seqs=sum(i.n_non_seqs for i in infos),
            as_while=False,
            n_untraced=sum(i.n_untraced for i in infos),
        )
        inner_inputs = (
            [v for op in ops for v in op.inner_seq_vars()]
            + [v for op in ops for g in op.inner_tap_vars() for v in g]
            + [v for op in ops for v in op.inner_untraced_vars()]
            + [v for op in ops for v in op.inner_non_seq_vars()]
        )
        inner_outputs = (
            [o for op in ops for o in op.inner_state_outs()]
            + [o for op in ops for o in op.inner_untraced_outs()]
            + [o for op in ops for o in op.inner_nit_sot_outs()]
        )
        new_fg = FunctionGraph(inner_inputs, inner_outputs, clone=True)
        new_op = Scan(new_fg, new_info,
                      name="+".join(op.name or "scan" for op in ops),
                      unroll=max(getattr(op, "unroll", 1) or 1 for op in ops))
        outer = (
            [v for n in nodes for v in n.op.outer_seqs(n.inputs)]
            + [v for n in nodes for v in n.op.outer_inits(n.inputs)]
            + [v for n in nodes for v in n.op.outer_untraced_inits(n.inputs)]
            + [v for n in nodes for v in n.op.outer_non_seqs(n.inputs)]
        )
        new_outs = new_op(nodes[0].inputs[0], *outer)
        if not isinstance(new_outs, list):
            new_outs = [new_outs]
        # distribute outputs back, section by section
        repl = []
        si = 0
        for n, i in zip(nodes, infos):
            for k in range(i.n_states):
                repl.append((n.outputs[k], new_outs[si]))
                si += 1
        for n, i in zip(nodes, infos):
            for u in range(i.n_untraced):
                repl.append((n.outputs[i.n_states + u], new_outs[si]))
                si += 1
        for n, i in zip(nodes, infos):
            for m in range(i.n_nit_sot):
                repl.append((n.outputs[i.n_states + i.n_untraced + m],
                             new_outs[si]))
                si += 1
        fgraph.replace_all_validate(repl, reason="scan_merge")


optdb.register("scan_merge", ScanMerge(), "fast_run", "scan", position=1.63)


@node_rewriter([Scan])
def scan_push_out_non_seqs(fgraph, node):
    """Hoist inner-graph subvalues that depend only on non-sequence inputs
    out of the loop (reference scan/rewriting/push_out.py): they become
    extra non-sequence inputs computed once.  XLA also hoists loop
    invariants, but doing it symbolically shrinks the traced loop body
    (faster jit) and exposes the hoisted value to outer-graph rewrites.
    """
    from pytensor_tpu.graph.basic import Constant
    from pytensor_tpu.graph.fg import FunctionGraph
    from pytensor_tpu.graph.replace import clone_replace
    from pytensor_tpu.graph.traversal import ancestors

    op = node.op
    info = op.info
    if info.as_while:
        return False
    inner_non_seqs = set(op.inner_non_seq_vars())
    loop_vars = set(op.fgraph.inputs) - inner_non_seqs

    # find maximal inner Apply outputs whose ancestors avoid loop vars
    def invariant(v):
        if v in inner_non_seqs or isinstance(v, Constant):
            return True
        if v.owner is None:
            return False
        return all(invariant(i) for i in v.owner.inputs)

    candidates = []
    for inner_node in op.fgraph.toposort():
        for out in inner_node.outputs:
            if not invariant(out):
                continue
            clients = op.fgraph.clients.get(out, ())
            # maximal: some client is NOT itself invariant (or it's an
            # inner output) — otherwise hoist the bigger parent instead
            if any(c == "output" or not all(invariant(o) for o in c.outputs)
                   for c, _ in clients):
                candidates.append(out)
    if not candidates:
        return False
    candidates = list(dict.fromkeys(candidates))

    # outer expressions: clone candidate subgraphs with inner non-seqs
    # replaced by the matching outer inputs
    outer_non_seqs = list(op.outer_non_seqs(node.inputs))
    mapping = dict(zip(op.inner_non_seq_vars(), outer_non_seqs))
    outer_values = clone_replace(candidates, replace=mapping)

    # rebuild the inner graph with fresh inputs standing for the hoisted
    # values
    fresh = [c.type() for c in candidates]
    new_inner_outputs = clone_replace(
        list(op.fgraph.outputs), replace=dict(zip(candidates, fresh)))
    new_inner_inputs = list(op.fgraph.inputs) + fresh
    # drop if nothing was actually replaced (candidates not upstream of
    # outputs)
    used = set(map(id, ancestors(new_inner_outputs)))
    if not any(id(f) in used for f in fresh):
        return False

    new_info = ScanInfo(
        n_seqs=info.n_seqs,
        taps=info.taps,
        n_nit_sot=info.n_nit_sot,
        n_non_seqs=info.n_non_seqs + len(fresh),
        as_while=False,
        n_untraced=info.n_untraced,
    )
    new_fg = FunctionGraph(new_inner_inputs, new_inner_outputs, clone=True)
    new_op = Scan(new_fg, new_info, name=op.name,
                  truncate_gradient=op.truncate_gradient,
                  unroll=getattr(op, "unroll", None))
    new_outs = new_op(*node.inputs, *outer_values)
    if not isinstance(new_outs, list):
        new_outs = [new_outs]
    return dict(zip(node.outputs, new_outs))


optdb.register(
    "scan_push_out_non_seqs",
    WalkingGraphRewriter(scan_push_out_non_seqs),
    "fast_run", "scan",
    position=1.601,  # reference scan_eqopt2 push-out region
)


@node_rewriter([Scan])
def scan_push_out_seqs(fgraph, node):
    """Hoist inner computation that depends only on sequence slices and
    non-sequences out of the loop (reference scan/rewriting/push_out.py
    ``pushout_seqs``): it is computed once, vectorized over the time axis
    via ``vectorize_graph``, and fed back in as a fresh sequence.  The MXU
    sees one batched op instead of T small per-step ops.
    """
    from pytensor_tpu.graph.basic import Constant
    from pytensor_tpu.graph.fg import FunctionGraph
    from pytensor_tpu.graph.replace import clone_replace, vectorize_graph
    from pytensor_tpu.graph.traversal import ancestors

    op = node.op
    info = op.info
    if info.as_while or info.n_seqs == 0:
        return False
    inner_seqs = list(op.inner_seq_vars())
    inner_non_seqs = list(op.inner_non_seq_vars())
    allowed = set(inner_seqs) | set(inner_non_seqs)
    seq_set = set(inner_seqs)

    cache: dict[int, tuple[bool, bool]] = {}

    def classify(v):
        """-> (eligible, touches_seq)"""
        r = cache.get(id(v))
        if r is not None:
            return r
        if v in allowed:
            r = (True, v in seq_set)
        elif isinstance(v, Constant):
            r = (True, False)
        elif v.owner is None:
            r = (False, False)
        else:
            subs = [classify(i) for i in v.owner.inputs]
            r = (all(e for e, _ in subs), any(s for _, s in subs))
        cache[id(v)] = r
        return r

    candidates = []
    for inner_node in op.fgraph.toposort():
        for out in inner_node.outputs:
            elig, has_seq = classify(out)
            if not elig or not has_seq:
                continue
            clients = op.fgraph.clients.get(out, ())
            # maximal: hoist only if some consumer stays in the loop (or
            # the value is an inner output) — otherwise hoist the parent
            if any(c == "output" or not all(classify(o)[0] for o in c.outputs)
                   for c, _ in clients):
                candidates.append(out)
    candidates = list(dict.fromkeys(candidates))
    # a candidate that is literally a single op on seq slices only is
    # already one fused elemwise per step; hoisting everything is still
    # a win (one batched op, smaller loop body), so keep all.
    if not candidates:
        return False

    outer_seqs = list(op.outer_seqs(node.inputs))
    outer_non_seqs = list(op.outer_non_seqs(node.inputs))
    mapping = dict(zip(inner_seqs, outer_seqs))
    mapping.update(zip(inner_non_seqs, outer_non_seqs))
    try:
        outer_vals = vectorize_graph(candidates, replace=mapping)
    except Exception:
        return False
    if not isinstance(outer_vals, list):
        outer_vals = [outer_vals]

    fresh = [c.type() for c in candidates]
    new_inner_outputs = clone_replace(
        list(op.fgraph.outputs), replace=dict(zip(candidates, fresh)))
    used = set(map(id, ancestors(new_inner_outputs)))
    keep = [i for i, f in enumerate(fresh) if id(f) in used]
    if not keep:
        return False
    fresh = [fresh[i] for i in keep]
    candidates = [candidates[i] for i in keep]
    outer_vals = [outer_vals[i] for i in keep]

    # vectorize_graph adds a leading time axis only to values that truly
    # vary with the sequence; shape-ops (Shape_i of a slice, MakeVector of
    # them, ...) come back batch-INVARIANT with the core ndim — those must
    # re-enter as non-sequences, not length-1 sequences
    seq_fresh, seq_vals, ns_fresh, ns_vals = [], [], [], []
    for f, c, v in zip(fresh, candidates, outer_vals):
        if v.type.ndim == c.type.ndim + 1:
            seq_fresh.append(f)
            seq_vals.append(v)
        elif v.type.ndim == c.type.ndim:
            ns_fresh.append(f)
            ns_vals.append(v)
        else:
            return False

    new_inner_inputs = (
        inner_seqs + seq_fresh
        + [v for g in op.inner_tap_vars() for v in g]
        + list(op.inner_untraced_vars())
        + inner_non_seqs + ns_fresh
    )
    new_info = ScanInfo(
        n_seqs=info.n_seqs + len(seq_fresh),
        taps=info.taps,
        n_nit_sot=info.n_nit_sot,
        n_non_seqs=info.n_non_seqs + len(ns_fresh),
        as_while=False,
        n_untraced=info.n_untraced,
    )
    new_fg = FunctionGraph(new_inner_inputs, new_inner_outputs, clone=True)
    new_op = Scan(new_fg, new_info, name=op.name,
                  truncate_gradient=op.truncate_gradient,
                  unroll=getattr(op, "unroll", None))
    new_outer = (
        outer_seqs + seq_vals
        + list(op.outer_inits(node.inputs))
        + list(op.outer_untraced_inits(node.inputs))
        + outer_non_seqs + ns_vals
    )
    new_outs = new_op(node.inputs[0], *new_outer)
    if not isinstance(new_outs, list):
        new_outs = [new_outs]
    return dict(zip(node.outputs, new_outs))


optdb.register(
    "scan_push_out_seqs",
    WalkingGraphRewriter(scan_push_out_seqs),
    "fast_run", "scan",
    position=1.602,  # reference pushout_seqs region
)


@node_rewriter([Scan])
def scan_push_out_non_recurrent_outputs(fgraph, node):
    """Replace nit-sot traces whose inner output is directly an inner
    input (a sequence slice / non-sequence) or a constant with the
    equivalent outer expression, removing the output from the loop
    (reference scan/rewriting/push_out.py ``pushout_non_recurrent_outputs``).
    ``scan_push_out_seqs`` reduces seq-only outputs to exactly this shape;
    the leftover unused nit-sot is then dropped by
    ``scan_remove_unused_outputs``.
    """
    from pytensor_tpu.graph.basic import Constant
    from pytensor_tpu.tensor.extra_ops import broadcast_to
    from pytensor_tpu.tensor.shape import specify_shape

    op = node.op
    info = op.info
    if info.as_while or info.n_nit_sot == 0:
        return False
    inner_seqs = list(op.inner_seq_vars())
    inner_non_seqs = list(op.inner_non_seq_vars())
    outer_seqs = list(op.outer_seqs(node.inputs))
    outer_non_seqs = list(op.outer_non_seqs(node.inputs))
    n_steps = node.inputs[0]

    nit_start = info.n_states + info.n_untraced
    repl = {}
    for m, inner_out in enumerate(op.inner_nit_sot_outs()):
        outer_out = node.outputs[nit_start + m]
        if not fgraph.clients.get(outer_out):
            continue
        if inner_out in inner_seqs:
            full = outer_seqs[inner_seqs.index(inner_out)]
            val = full[:n_steps]
        elif inner_out in inner_non_seqs:
            v = outer_non_seqs[inner_non_seqs.index(inner_out)]
            val = broadcast_to(v, (n_steps, *tuple(v.shape)))
        elif isinstance(inner_out, Constant):
            val = broadcast_to(inner_out, (n_steps, *inner_out.data.shape))
        else:
            continue
        if any(s is not None for s in outer_out.type.shape):
            val = specify_shape(val, outer_out.type.shape)
        repl[outer_out] = val
    return repl or False


optdb.register(
    "scan_push_out_non_recurrent_outputs",
    WalkingGraphRewriter(scan_push_out_non_recurrent_outputs),
    "fast_run", "scan",
    position=1.603,  # reference pushout_non_recurrent_outputs region
)


@node_rewriter([Scan])
def scan_push_out_add(fgraph, node):
    """Rewrite a pure-accumulator state ``acc' = acc + f(t)`` (f free of
    recurrent state) whose trace is read only at [-1] into a nit-sot trace
    of ``f`` summed outside the loop (reference scan/rewriting/push_out.py
    ``push_out_add``).  Combined with ``scan_push_out_seqs`` /
    ``scan_push_out_non_recurrent_outputs`` the loop often disappears
    entirely, leaving one batched elemwise + reduction for the VPU/MXU
    instead of T sequential adds.
    """
    from pytensor_tpu.graph.traversal import ancestors
    from pytensor_tpu.tensor import math as tm
    from pytensor_tpu.tensor.elemwise import Elemwise
    from pytensor_tpu.tensor.subtensor import Subtensor

    op = node.op
    info = op.info
    if info.as_while:
        return False

    def only_last_element_clients(out):
        return _last_index_clients_only(fgraph, node, out)

    n_seqs = info.n_seqs
    tap_groups = []
    pos = n_seqs
    for taps in info.taps:
        tap_groups.append(op.fgraph.inputs[pos: pos + len(taps)])
        pos += len(taps)
    all_tap_vars = {v for g in tap_groups for v in g}
    untraced_vars = set(op.inner_untraced_vars())
    state_outs = op.inner_state_outs()
    other_outputs_anc = None  # computed lazily

    convert = {}  # k -> rest expression
    for k, taps in enumerate(info.taps):
        if taps != (-1,):
            continue
        if not only_last_element_clients(node.outputs[k]):
            continue
        out = state_outs[k]
        if out.owner is None or not isinstance(out.owner.op, Elemwise) \
                or out.owner.op.scalar_op.name != "add" \
                or len(out.owner.inputs) != 2:
            continue
        a, b = out.owner.inputs
        tap_var = tap_groups[k][0]
        rest = b if a is tap_var else (a if b is tap_var else None)
        if rest is None:
            continue
        # f must be free of every recurrent/untraced carry
        if any(v in all_tap_vars or v in untraced_vars
               for v in ancestors([rest]) ):
            continue
        # the accumulator must feed nothing but this add
        if other_outputs_anc is None:
            others = [o for j, o in enumerate(state_outs) if j != k]
            others += list(op.inner_untraced_outs()) + list(op.inner_nit_sot_outs())
            other_outputs_anc = set(ancestors(others))
        if tap_var in other_outputs_anc:
            continue
        # rest must broadcast to the state shape exactly (the summed
        # trace has the per-step shape); require matching static ndim
        if rest.type.ndim != out.type.ndim:
            continue
        convert[k] = rest
        break  # one at a time; the walker re-runs until exhaustion

    if not convert:
        return False
    (k, rest), = convert.items()

    from pytensor_tpu.graph.fg import FunctionGraph

    keep = [j for j in range(info.n_states) if j != k]
    new_inner_inputs = (
        list(op.fgraph.inputs[:n_seqs])
        + [v for j in keep for v in tap_groups[j]]
        + list(op.inner_untraced_vars())
        + list(op.inner_non_seq_vars())
    )
    new_inner_outputs = (
        [state_outs[j] for j in keep]
        + list(op.inner_untraced_outs())
        + list(op.inner_nit_sot_outs())
        + [rest]
    )
    new_info = ScanInfo(
        n_seqs=n_seqs,
        taps=tuple(info.taps[j] for j in keep),
        n_nit_sot=info.n_nit_sot + 1,
        n_non_seqs=info.n_non_seqs,
        as_while=False,
        n_untraced=info.n_untraced,
    )
    new_fg = FunctionGraph(new_inner_inputs, new_inner_outputs, clone=True)
    new_op = Scan(new_fg, new_info, name=op.name,
                  truncate_gradient=op.truncate_gradient,
                  unroll=getattr(op, "unroll", None))

    outer_inits = op.outer_inits(node.inputs)
    new_outer = (
        list(op.outer_seqs(node.inputs))
        + [outer_inits[j] for j in keep]
        + list(op.outer_untraced_inits(node.inputs))
        + list(op.outer_non_seqs(node.inputs))
    )
    new_outs = new_op(node.inputs[0], *new_outer)
    if not isinstance(new_outs, list):
        new_outs = [new_outs]

    repl = []
    for j2, j in enumerate(keep):
        repl.append((node.outputs[j], new_outs[j2]))
    base = len(keep)
    for u in range(info.n_untraced):
        repl.append((node.outputs[info.n_states + u], new_outs[base + u]))
    for m in range(info.n_nit_sot):
        repl.append((node.outputs[info.n_states + info.n_untraced + m],
                     new_outs[base + info.n_untraced + m]))
    f_trace = new_outs[base + info.n_untraced + info.n_nit_sot]
    final = outer_inits[k] + tm.sum(f_trace, axis=0)
    for c, _ in list(fgraph.clients.get(node.outputs[k], ())):
        repl.append((c.outputs[0], final))
    return dict(repl)


optdb.register(
    "scan_push_out_add",
    WalkingGraphRewriter(scan_push_out_add),
    "fast_run", "scan",
    position=1.602,  # reference push_out_add region
)


@node_rewriter([Scan])
def scan_reduce_nsteps(fgraph, node):
    """Shorten ``n_steps`` when every read of every Scan output touches
    only a constant prefix of the trace (reference
    scan/rewriting/trace.py:140 ``scan_reduce_nsteps``): ``scan(...,
    n_steps=T)[0][:k]`` or ``...[i]`` with ``i >= 0`` only needs
    ``max(k, i+1)`` iterations.
    """
    from pytensor_tpu.tensor.basic import constant
    from pytensor_tpu.tensor.subtensor import DYN, Subtensor

    op = node.op
    info = op.info
    if info.as_while:
        return False
    try:
        T = int(get_scalar_constant_value(node.inputs[0]))
    except NotScalarConstantError:
        return False

    # untraced finals depend on running ALL steps
    for u in range(info.n_untraced):
        if fgraph.clients.get(node.outputs[info.n_states + u]):
            return False

    needed = 0
    clients_to_rewrite = []
    any_used = False
    for k, out in enumerate(node.outputs):
        clients = fgraph.clients.get(out, ())
        if not clients:
            continue
        any_used = True
        for c, idx in clients:
            if c == "output" or not isinstance(c.op, Subtensor):
                return False
            if idx != 0:
                # trace used as a dynamic index operand, not as the
                # indexed tensor — cannot infer the needed prefix
                return False
            il = c.op.idx_list
            if not il:
                return False
            e = il[0]
            if isinstance(e, (int, np.integer)):
                i = int(e)
                if i < 0:
                    return False
                needed = max(needed, i + 1)
            elif isinstance(e, tuple) and e[0] == "slice":
                _, start, stop, step = e
                if stop is None or stop == DYN or int(stop) < 0:
                    return False
                if start == DYN or (start is not None and int(start) < 0):
                    return False
                if step == DYN or (step is not None and int(step) < 0):
                    return False
                needed = max(needed, int(stop))
            else:
                return False
            clients_to_rewrite.append((c, k))
    if not any_used or needed >= T or needed < 1:
        return False

    new_outs = op(constant(np.int64(needed)), *node.inputs[1:])
    if not isinstance(new_outs, list):
        new_outs = [new_outs]
    repl = {}
    for c, k in clients_to_rewrite:
        # same index expression against the shortened trace
        new_client_out = c.op(new_outs[k], *c.inputs[1:])
        repl[c.outputs[0]] = new_client_out
    return repl


optdb.register(
    "scan_reduce_nsteps",
    WalkingGraphRewriter(scan_reduce_nsteps),
    "fast_run", "scan", "scan_save_mem",
    position=1.611,  # reference position
)
