"""Scan rewrites.

Parallels /root/reference/pytensor/scan/rewriting/ (push_out.py, io.py,
trace.py, merge.py).  On the XLA backend several reference passes are
subsumed by the compiler: within one jitted executable XLA hoists
loop-invariant computation out of lax.scan (push_out) and DCEs unused
loop-carried values; buffer-truncation (trace.py) corresponds to not
stacking ys at all.  What remains profitable at graph level:

- scan_remove_unused_outputs: drop nit-sot traces nobody reads (smaller
  carry/ys pytrees -> less HBM traffic);
- scan_push_out_non_seqs: move loop-invariant inner subgraphs that depend
  only on non-sequence inputs out of the inner graph (XLA would also do
  this, but doing it symbolically shrinks the traced loop body and
  compile time).
"""

from __future__ import annotations

from pytensor_tpu.compile.mode import optdb
from pytensor_tpu.graph.rewriting.basic import WalkingGraphRewriter, node_rewriter
from pytensor_tpu.scan.op import Scan, ScanInfo


@node_rewriter([Scan])
def scan_remove_unused_outputs(fgraph, node):
    """Rebuild Scan without nit-sot outputs that have no clients."""
    op = node.op
    info = op.info
    if info.n_nit_sot == 0 or info.as_while:
        return False
    used = [bool(fgraph.clients.get(o)) for o in node.outputs]
    nit_start = info.n_states
    drop = [k for k in range(info.n_nit_sot) if not used[nit_start + k]]
    if not drop:
        return False
    keep_nit = [k for k in range(info.n_nit_sot) if k not in drop]
    inner_outputs = (
        op.inner_state_outs()
        + [op.inner_nit_sot_outs()[k] for k in keep_nit]
    )
    from pytensor_tpu.graph.fg import FunctionGraph

    new_info = ScanInfo(
        n_seqs=info.n_seqs,
        taps=info.taps,
        n_nit_sot=len(keep_nit),
        n_non_seqs=info.n_non_seqs,
        as_while=False,
    )
    new_fg = FunctionGraph(list(op.fgraph.inputs), list(inner_outputs), clone=True)
    new_op = Scan(new_fg, new_info, name=op.name,
                  truncate_gradient=op.truncate_gradient)
    new_outs = new_op(*node.inputs)
    if not isinstance(new_outs, list):
        new_outs = [new_outs]
    # map old outputs -> new (dropped ones keep the old var; they have no
    # clients so the replacement list skips them)
    repl = []
    for k in range(info.n_states):
        repl.append((node.outputs[k], new_outs[k]))
    j = info.n_states
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
