"""ProfileStats: compile/rewrite/runtime accounting.

Parallels /root/reference/pytensor/compile/debug/profiling.py
(ProfileStats:126).  On the oracle VM, per-node wall time is recorded per
call; on the XLA backend, per-op timing is the compiler's job — we
surface the XLA cost analysis (flops / bytes accessed) and per-call wall
time instead, plus the compile/rewrite split.
"""

from __future__ import annotations

import atexit
import time
from collections import defaultdict
from io import StringIO

_all_stats: list = []


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
        self.xla_cost = None
        if atexit_print:
            _all_stats.append(self)

    def record_call(self, dt):
        self.call_count += 1
        self.call_time += dt

    def record_node(self, op, dt):
        self.op_time[str(op)] += dt
        self.op_calls[str(op)] += 1

    def summary(self, file=None):
        buf = StringIO()
        print(f"ProfileStats({self.name or 'function'})", file=buf)
        print(f"  compile_time: {self.compile_time:.4f}s "
              f"(rewrites: {self.rewrite_time:.4f}s)", file=buf)
        print(f"  calls: {self.call_count}, total call time {self.call_time:.4f}s",
              file=buf)
        if self.op_time:
            total = sum(self.op_time.values()) or 1.0
            print("  per-op time (oracle VM):", file=buf)
            for op, t in sorted(self.op_time.items(), key=lambda kv: -kv[1])[:20]:
                print(f"    {100 * t / total:5.1f}%  {t:.5f}s  "
                      f"{self.op_calls[op]:6d}x  {op}", file=buf)
        if self.xla_cost:
            print(f"  XLA cost analysis: {self.xla_cost}", file=buf)
        out = buf.getvalue()
        if file is None:
            print(out)
        else:
            file.write(out)
        return out


class ProfilingLinkerMixin:
    """Wraps oracle thunks with timers feeding a ProfileStats."""


def profile_function(fn, stats: ProfileStats | None = None):
    """Attach runtime profiling to a compiled Function."""
    stats = stats or ProfileStats(name=fn.name)
    fn.profile_stats = stats
    stats.compile_time = fn.compile_time
    stats.rewrite_time = fn.rewrite_time
    if fn._backend == "py":
        thunks = fn._run.thunks

        def timed_vm(*vals):
            for s, v in zip(fn._run.input_storage, vals):
                s[0] = v
            for thunk in thunks:
                t0 = time.perf_counter()
                thunk()
                stats.record_node(thunk.node.op, time.perf_counter() - t0)
            return tuple(s[0] for s in fn._run.output_storage)

        fn.vm = timed_vm
    else:
        # XLA: surface the compiled executable's cost analysis (flops,
        # bytes accessed, per-output sizes) from the jitted callable
        orig_vm = fn.vm

        def _fill_cost(*example_args):
            try:
                lowered = orig_vm.lower(*example_args)
                cost = lowered.compile().cost_analysis()
                if isinstance(cost, (list, tuple)):
                    cost = cost[0] if cost else {}
                stats.xla_cost = {
                    k: v for k, v in dict(cost).items()
                    if k in ("flops", "bytes accessed",
                             "bytes accessed output", "transcendentals",
                             "optimal_seconds") or k.startswith("bytes")
                }
            except Exception:
                stats.xla_cost = None

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
