"""FusedElemwise: one kernel per fused elementwise subgraph.

Parallels /root/reference/pytensor/tensor/rewriting/fused_elemwise.py
(FusedElemwise:107 — the OpFromGraph-based fusion container) and the C
Composite kernels it replaces.  TPU-first: the XLA lowering either
inlines the jnp expression (XLA's fuser handles it) or — with
config.pallas__fusion — emits ONE Pallas VPU kernel computing the whole
subgraph on VMEM tiles (the analog of the reference's single C loop from
elemwise_cgen.py).
"""

from __future__ import annotations

import numpy as np

from pytensor_tpu.compile.builders import OpFromGraph
from pytensor_tpu.config import config


class FusedElemwise(OpFromGraph):
    """Container for a fused elementwise subgraph (possibly multi-output)."""

    def __str__(self):
        inner_ops = sorted({str(n.op) for n in self.fgraph.apply_nodes})
        return f"FusedElemwise{{{'|'.join(inner_ops)[:60]}}}"


LANE = 128
SUBLANE = 8
BLOCK_ROWS = 256  # rows of 128 lanes per grid step (256*128*4B = 128 KiB/buf)


def pallas_elemwise_call(inner_fn, n_outputs, out_dtypes):
    """Build a callable evaluating ``inner_fn`` (jnp elementwise math) as a
    single Pallas kernel over flattened, lane-aligned tiles."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(*refs):
        in_refs = refs[:-n_outputs] if n_outputs else refs
        out_refs = refs[len(refs) - n_outputs:]
        vals = [r[:] for r in in_refs]
        res = inner_fn(*vals)
        if not isinstance(res, (list, tuple)):
            res = (res,)
        for o_ref, r in zip(out_refs, res):
            o_ref[:] = r.astype(o_ref.dtype)

    def call(*args):
        shape = jnp.broadcast_shapes(*(jnp.shape(a) for a in args))
        n = int(np.prod(shape)) if shape else 1
        bargs = [jnp.broadcast_to(jnp.asarray(a), shape).reshape(-1) for a in args]
        # pad to a (rows, 128) layout
        rows = -(-n // LANE)
        rows_padded = -(-rows // SUBLANE) * SUBLANE
        total = rows_padded * LANE
        bargs = [
            jnp.pad(a, (0, total - n)).reshape(rows_padded, LANE) for a in bargs
        ]
        block_rows = min(BLOCK_ROWS, rows_padded)
        # block count must divide evenly: pad rows to a block multiple
        grid_rows = -(-rows_padded // block_rows) * block_rows
        if grid_rows != rows_padded:
            bargs = [
                jnp.pad(a, ((0, grid_rows - rows_padded), (0, 0))) for a in bargs
            ]
        grid = (grid_rows // block_rows,)
        # index-map zero must be strongly int32: under jax_enable_x64 a
        # python literal 0 becomes int64 and Mosaic rejects the mixed-width
        # (i32, i64) index tuple
        zero = np.int32(0)
        in_specs = [
            pl.BlockSpec((block_rows, LANE), lambda i: (i, zero),
                         memory_space=pltpu.VMEM)
            for _ in bargs
        ]
        out_specs = [
            pl.BlockSpec((block_rows, LANE), lambda i: (i, zero),
                         memory_space=pltpu.VMEM)
            for _ in range(n_outputs)
        ]
        out_shape = [
            jax.ShapeDtypeStruct((grid_rows, LANE), np.dtype(d))
            for d in out_dtypes
        ]
        res = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=in_specs,
            out_specs=out_specs if n_outputs > 1 else out_specs[0],
            out_shape=out_shape if n_outputs > 1 else out_shape[0],
        )(*bargs)
        if n_outputs == 1:
            res = (res,)
        outs = tuple(r.reshape(-1)[:n].reshape(shape) for r in res)
        return outs if n_outputs > 1 else outs[0]

    return call


def _register_xla():
    from pytensor_tpu.link.xla.dispatch import xla_funcify
    from pytensor_tpu.link.xla.linker import fgraph_to_jax

    @xla_funcify.register(FusedElemwise)
    def _fused(op, node=None, **kw):
        inner = fgraph_to_jax(op.fgraph)
        n_out = len(op.fgraph.outputs)
        if not config.pallas__fusion:
            def inline(*args):
                res = inner(*args)
                return res if n_out > 1 else res[0]

            return inline
        out_dtypes = [o.type.dtype for o in op.fgraph.outputs]
        pallas_fn = pallas_elemwise_call(inner, n_out, out_dtypes)

        def fused(*args):
            import jax.numpy as jnp

            # pallas path needs float/int tiles; tiny arrays skip the kernel
            shape = jnp.broadcast_shapes(*(jnp.shape(a) for a in args))
            n = int(np.prod(shape)) if shape else 1
            if n < LANE * SUBLANE:
                res = inner(*args)
                return res if n_out > 1 else res[0]
            return pallas_fn(*args)

        return fused


_register_xla()


def _register_fusion_pass():
    """composite_elemwise_fusion: greedily merge connected Elemwise chains
    into FusedElemwise containers (reference FusionOptimizer:570)."""
    from pytensor_tpu.compile.mode import fusedb
    from pytensor_tpu.graph.basic import Constant
    from pytensor_tpu.graph.fg import FunctionGraph
    from pytensor_tpu.graph.rewriting.basic import GraphRewriter
    from pytensor_tpu.tensor.elemwise import DimShuffle, Elemwise
    from pytensor_tpu.tensor.type import TensorType

    def fusable(node):
        if not isinstance(node.op, Elemwise):
            return False
        # only fuse real math (casts and `second` change shapes/dtypes in
        # ways the pallas tile kernel must not see)
        name = node.op.scalar_op.name
        if name.startswith("cast") or name == "second":
            return False
        return all(isinstance(o.type, TensorType) for o in node.outputs)

    class FusionOptimizer(GraphRewriter):
        name = "composite_elemwise_fusion"

        def apply(self, fgraph):
            changed = 0
            grouped: set = set()
            # deterministic member order for input/output collection:
            # iterating the `group` SET directly orders by id() and makes
            # the fused op's signature differ run-to-run (caught by the
            # DebugMode StochasticOrder check)
            topo_pos = {n: i for i, n in enumerate(fgraph.toposort())}
            for root in reversed(fgraph.toposort()):
                if root in grouped or root not in fgraph.apply_nodes:
                    continue
                if not fusable(root):
                    continue
                group = {root}
                frontier = list(root.inputs)
                while frontier:
                    v = frontier.pop()
                    n = v.owner
                    if n is None or n in group or not fusable(n):
                        continue
                    clients = [
                        c for c, _ in fgraph.clients.get(v, ())
                        if c != "output"
                    ]
                    if not all(c in group for c in clients):
                        continue
                    if any(c == "output" for c, _ in fgraph.clients.get(v, ())):
                        continue
                    group.add(n)
                    frontier.extend(n.inputs)
                if len(group) < 2:
                    continue
                # group inputs/outputs (in topological member order)
                members = sorted(group, key=lambda n: topo_pos.get(n, -1))
                g_inputs = []
                for n in members:
                    for i in n.inputs:
                        if (i.owner not in group) and i not in g_inputs \
                                and not isinstance(i, Constant):
                            g_inputs.append(i)
                g_outputs = []
                for n in members:
                    for o in n.outputs:
                        cl = fgraph.clients.get(o, ())
                        if any(c == "output" or c not in group
                               for c, _ in cl) and o not in g_outputs:
                            g_outputs.append(o)
                if not g_outputs or len(g_inputs) > 16:
                    continue
                fused_op = FusedElemwise(g_inputs, g_outputs)
                new_outs = fused_op(*g_inputs)
                if not isinstance(new_outs, list):
                    new_outs = [new_outs]
                try:
                    fgraph.replace_all_validate(
                        list(zip(g_outputs, new_outs)), reason="elemwise_fusion"
                    )
                    changed += 1
                    grouped.update(group)
                except Exception:
                    continue
            return changed

    fusedb.register("composite_elemwise_fusion", FusionOptimizer(),
                    "fast_run", "fusion", position=1)


_register_fusion_pass()
