"""ProfileStats: compile/rewrite/runtime accounting.

Parallels /root/reference/pytensor/compile/debug/profiling.py
(ProfileStats:126) redesigned for the XLA backend.  The reference times
each thunk in its VM inner loop (link/vm.py:243); under jit there are no
per-node thunks, so runtime attribution comes from three sources instead:

- the py-oracle VM still has per-node timers (exact, slow path);
- the compiled XLA executable's own cost analysis (flops, bytes
  accessed, transcendentals) and memory analysis (temp/output/argument
  buffer high-water) — the compiler's ground truth for the whole graph;
- a static per-op cost model over the final (rewritten) fgraph that
  splits estimated flops/bytes per op class, so `profile=True` still
  prints the familiar per-op table for any graph.

The rewrite-time split is per registered pass (the reference's
`profile_optimizer`): SequentialGraphRewriter already returns
(name, sub_profile, seconds) tuples; `function()` stores them here.
"""

from __future__ import annotations

import atexit
import time
from collections import defaultdict
from io import StringIO

_all_stats: list = []


def _prod(xs):
    r = 1
    for x in xs:
        if x is None:
            return None
        r *= int(x)
    return r


def _dtype_size(dtype) -> int:
    import numpy as np

    try:
        return np.dtype(dtype).itemsize
    except Exception:
        return 8


def estimate_node_cost(node):
    """(flops, bytes) static estimate for one Apply node; None when the
    shapes are not fully static."""
    op = node.op
    opname = type(op).__name__

    def size(v):
        return _prod(getattr(v.type, "shape", ()) or ())

    out = node.outputs[0]
    out_n = size(out)
    in_bytes = 0
    for i in node.inputs:
        s = size(i)
        if s is None:
            in_bytes = None
            break
        in_bytes += s * _dtype_size(getattr(i.type, "dtype", "float64"))
    out_bytes = None
    if out_n is not None:
        out_bytes = sum(
            (size(o) or 0) * _dtype_size(getattr(o.type, "dtype", "float64"))
            for o in node.outputs
        )
    bytes_ = (in_bytes + out_bytes) if (in_bytes is not None and out_bytes is not None) else None

    # matmul family: 2*m*k*n
    if opname in ("Dot", "Dot22", "Gemm", "Dot22Scalar", "BatchedDot") or (
        opname == "Blockwise" and type(getattr(op, "core_op", None)).__name__ in ("Dot",)
    ):
        a, b = node.inputs[:2] if opname != "Gemm" else (node.inputs[1], node.inputs[2])
        ash = getattr(a.type, "shape", None)
        bsh = getattr(b.type, "shape", None)
        if ash and bsh and all(s is not None for s in ash) and all(s is not None for s in bsh):
            k = ash[-1]
            m = _prod(ash[:-1]) or 1
            n = bsh[-1] if len(bsh) > 1 else 1
            batch = 1
            if opname == "BatchedDot":
                batch = ash[0]
                m = _prod(ash[1:-1]) or 1
            return 2 * batch * m * k * n, bytes_
        return None, bytes_
    if opname in ("Gemv", "Ger"):
        a = node.inputs[1] if opname == "Gemv" else node.inputs[0]
        n = size(node.inputs[1])
        if out_n is not None and n is not None:
            return 2 * out_n * max(1, n // max(1, out_n)), bytes_
        return None, bytes_
    # elemwise / reductions: ~1 flop per input element
    if opname in ("Elemwise", "CAReduce", "DimShuffle", "Alloc", "Join",
                  "Split", "Subtensor", "IncSubtensor"):
        flops = None
        if all(size(i) is not None for i in node.inputs if hasattr(i.type, "shape")):
            flops = sum(size(i) or 0 for i in node.inputs)
        return flops, bytes_
    return None, bytes_


class ProfileStats:
    def __init__(self, name=None, atexit_print=False):
        self.name = name
        self.compile_time = 0.0
        self.rewrite_time = 0.0
        self.linker_time = 0.0
        self.call_count = 0
        self.call_time = 0.0
        self.op_time: dict = defaultdict(float)
        self.op_calls: dict = defaultdict(int)
        self.rewrite_pass_times: list = []  # (pass_name, seconds)
        self.op_table: list = []  # (op, count, est_flops, est_bytes)
        self.xla_cost = None
        self.xla_memory = None
        if atexit_print:
            _all_stats.append(self)

    def record_call(self, dt):
        self.call_count += 1
        self.call_time += dt

    def record_node(self, op, dt):
        self.op_time[str(op)] += dt
        self.op_calls[str(op)] += 1

    def record_rewrite_profile(self, profs, prefix=""):
        """Flatten SequentialGraphRewriter (name, sub, dt) tuples."""
        if not isinstance(profs, (list, tuple)):
            return
        for entry in profs:
            if (isinstance(entry, tuple) and len(entry) == 3
                    and isinstance(entry[2], (int, float))):
                name, sub, dt = entry
                self.rewrite_pass_times.append((f"{prefix}{name}", float(dt)))
            # sub-profiles of nested sequences are attributed to the parent

    def build_op_table(self, fgraph):
        """Static per-op aggregation of the final rewritten graph."""
        agg: dict = {}
        for node in fgraph.toposort():
            key = str(node.op)
            cnt, fl, by = agg.get(key, (0, 0, 0))
            f, b = estimate_node_cost(node)
            agg[key] = (cnt + 1, fl + (f or 0), by + (b or 0))
        self.op_table = sorted(
            ((op, c, f, b) for op, (c, f, b) in agg.items()),
            key=lambda t: (-t[2], -t[3], -t[1]),
        )

    def summary(self, file=None):
        buf = StringIO()
        print(f"ProfileStats({self.name or 'function'})", file=buf)
        print(f"  compile_time: {self.compile_time:.4f}s "
              f"(rewrites: {self.rewrite_time:.4f}s)", file=buf)
        if self.rewrite_pass_times:
            total_rw = sum(t for _, t in self.rewrite_pass_times) or 1.0
            print("  rewrite passes (top 10 by time):", file=buf)
            for name, t in sorted(self.rewrite_pass_times,
                                  key=lambda kv: -kv[1])[:10]:
                print(f"    {100 * t / total_rw:5.1f}%  {t:.5f}s  {name}",
                      file=buf)
        if self.call_count:
            print(f"  calls: {self.call_count}, total call time "
                  f"{self.call_time:.4f}s "
                  f"({1e6 * self.call_time / self.call_count:.1f} us/call)",
                  file=buf)
        if self.op_time:
            total = sum(self.op_time.values()) or 1.0
            print("  per-op time (oracle VM):", file=buf)
            for op, t in sorted(self.op_time.items(), key=lambda kv: -kv[1])[:20]:
                print(f"    {100 * t / total:5.1f}%  {t:.5f}s  "
                      f"{self.op_calls[op]:6d}x  {op}", file=buf)
        if self.op_table:
            print("  per-op static cost (final graph; est. flops / bytes):",
                  file=buf)
            for op, c, f, b in self.op_table[:20]:
                print(f"    {c:5d}x  {f:>12,} flops  {b:>12,} B  {op}",
                      file=buf)
        if self.xla_cost:
            print(f"  XLA cost analysis: {self.xla_cost}", file=buf)
        if self.xla_memory:
            print(f"  XLA memory analysis: {self.xla_memory}", file=buf)
        out = buf.getvalue()
        if file is None:
            print(out)
        else:
            file.write(out)
        return out


def profile_function(fn, stats: ProfileStats | None = None):
    """Attach runtime profiling to a compiled Function.  The atexit
    summary fires only under the global ``config.profile`` flag (the
    reference's behavior); per-call ``function(profile=True)`` keeps the
    stats on ``fn.profile_stats`` for explicit inspection."""
    if stats is None:
        from pytensor_tpu.config import config

        stats = ProfileStats(name=fn.name,
                             atexit_print=bool(config.profile))
    fn.profile_stats = stats
    stats.compile_time = fn.compile_time
    stats.rewrite_time = fn.rewrite_time
    stats.record_rewrite_profile(getattr(fn, "rewrite_profile", None))
    try:
        stats.build_op_table(fn.fgraph)
    except Exception:
        pass
    if fn._backend == "py":
        thunks = fn._run.thunks

        def timed_vm(*vals):
            t0 = time.perf_counter()
            for s, v in zip(fn._run.input_storage, vals):
                s[0] = v
            for thunk in thunks:
                tn = time.perf_counter()
                thunk()
                stats.record_node(thunk.node.op, time.perf_counter() - tn)
            res = tuple(s[0] for s in fn._run.output_storage)
            stats.record_call(time.perf_counter() - t0)
            return res

        fn.vm = timed_vm
    else:
        # XLA: surface the compiled executable's cost + memory analysis
        orig_vm = fn.vm

        def _fill_cost(*example_args):
            try:
                lowered = orig_vm.lower(*example_args)
                compiled = lowered.compile()
                cost = compiled.cost_analysis()
                if isinstance(cost, (list, tuple)):
                    cost = cost[0] if cost else {}
                stats.xla_cost = {
                    k: v for k, v in dict(cost).items()
                    if k in ("flops", "bytes accessed", "bytes accessedout{}",
                             "bytes accessed output", "transcendentals",
                             "utilization", "optimal_seconds")
                }
            except Exception:
                stats.xla_cost = None
            try:
                mem = compiled.memory_analysis()
                stats.xla_memory = {
                    "temp_bytes": getattr(mem, "temp_size_in_bytes", None),
                    "argument_bytes": getattr(mem, "argument_size_in_bytes", None),
                    "output_bytes": getattr(mem, "output_size_in_bytes", None),
                    "generated_code_bytes": getattr(
                        mem, "generated_code_size_in_bytes", None),
                }
            except Exception:
                stats.xla_memory = None

        fn._fill_xla_cost = _fill_cost
        filled = [False]

        def timed_vm(*vals):
            if not filled[0]:
                filled[0] = True
                _fill_cost(*vals)
            t0 = time.perf_counter()
            res = orig_vm(*vals)
            import jax

            jax.block_until_ready(res)
            stats.record_call(time.perf_counter() - t0)
            return res

        fn.vm = timed_vm
    return fn


@atexit.register
def _print_atexit():
    for s in _all_stats:
        s.summary()
