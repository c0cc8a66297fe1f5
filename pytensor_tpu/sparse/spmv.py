"""Routed SpMV: constant-pattern CSR matvec as MXU matmuls + lane
gathers (no XLA scatter/gather anywhere on the hot path).

The reference's unstructured CSR matvec runs C row loops
(/root/reference/pytensor/sparse/basic.py:1340 StructuredDot).  On TPU
the equivalent "gather x[cols], segment-sum by row" graph is dominated
by XLA's generic gather (~6 ns/element serial); this module removes it.

Pipeline (all tables trace-time constants derived from the sparsity
pattern; see link/pallas/route.py for the routing machinery):

1. pack nnz by 128-wide column SEGMENT; each packed (row of 128 slots)
   draws from one segment.
2. phase A — replicate segments: per 128-segment block b, a one-hot
   matmul ``T_b @ X2[b]`` (MXU) copies each packed row's segment into
   place; ONE lane gather then picks each slot's element within the
   segment.  Result G: x[col] per nnz, in column-segment order.
3. phase B — route G through a constant grid permutation to the
   row-major destination layout (rows grouped by 128-row output chunk,
   depth D2 = max nnz/row, one lane per output row).
4. phase C — multiply by the values (zeros at padding) and reduce the
   depth axis: ``(P[:K2].reshape(chunks, D2, 128)).sum(1)`` — a plain
   reshape-sum, no boundaries.

Eligibility: pattern constant at trace time, float32/bfloat16 dense
operand, padded sizes within K <= 16384 rows (~2M routed slots).
"""

from __future__ import annotations

import numpy as np

from pytensor_tpu.link.pallas.route import (
    LANES,
    apply_grid_permutation,
    lane_gather,
    plan_grid_permutation,
)

_MAX_K = 16384


def _pow2_rows(n):
    """Smallest K = 128 * 2^j >= n (or None if > _MAX_K)."""
    K = LANES
    while K < n:
        K *= 2
    return K if K <= _MAX_K else None


def plan_spmv(A):
    """Build the routed-SpMV plan for a scipy CSR/CSC/COO matrix.
    Returns None when the matrix does not fit the kernel's gates."""
    import scipy.sparse as sp

    if not sp.issparse(A):
        return None
    A = A.tocoo()
    M, N = A.shape
    nnz = A.nnz
    if nnz == 0:
        return None
    rows = A.row.astype(np.int64)
    cols = A.col.astype(np.int64)
    vals = A.data

    S = -(-N // LANES)          # x segments
    nc = -(-M // LANES)         # output chunks
    nb = -(-S // LANES)         # segment blocks (phase A matmuls)

    # --- destination layout: (chunk R, depth k, lane rho) ---
    order_r = np.argsort(rows, kind="stable")
    r_sorted = rows[order_r]
    # rank of each nnz within its row
    row_starts = np.searchsorted(r_sorted, np.arange(M + 1))
    k_rank = np.arange(nnz) - row_starts[r_sorted]
    D2 = int(k_rank.max()) + 1 if nnz else 1
    K2 = nc * D2
    dst_row = np.empty(nnz, np.int64)
    dst_lane = np.empty(nnz, np.int64)
    dst_row[order_r] = (r_sorted // LANES) * D2 + k_rank
    dst_lane[order_r] = r_sorted % LANES

    # --- source layout: packed by column segment ---
    seg = cols // LANES
    order_c = np.argsort(seg, kind="stable")
    seg_sorted = seg[order_c]
    seg_starts = np.searchsorted(seg_sorted, np.arange(S + 1))
    pos_in_seg = np.arange(nnz) - seg_starts[seg_sorted]
    # rows needed per segment, padded so each packed row is one segment
    rows_per_seg = -(-np.diff(seg_starts) // LANES)
    seg_row0 = np.concatenate([[0], np.cumsum(rows_per_seg)])
    Kg = int(seg_row0[-1])
    src_row = np.empty(nnz, np.int64)
    src_lane = np.empty(nnz, np.int64)
    src_row[order_c] = seg_row0[seg_sorted] + pos_in_seg // LANES
    src_lane[order_c] = pos_in_seg % LANES

    K = _pow2_rows(max(Kg, K2, 1))
    if K is None or D2 > LANES:
        return None

    # phase A tables: packed row -> (segment block, local segment)
    packed_seg = np.repeat(np.arange(S), rows_per_seg)
    onehot = np.zeros((Kg, LANES), np.float32)
    onehot[np.arange(Kg), packed_seg % LANES] = 1.0
    blk_of_row = (packed_seg // LANES).astype(np.int32)
    # rows grouped by segment block already (segments sorted)
    blk_starts = np.searchsorted(blk_of_row, np.arange(nb + 1))
    # lane-selection indices over the K-padded grid (the lane gather
    # runs after padding so its row count is 128-aligned)
    l_idx = np.zeros((K, LANES), np.int8)
    l_idx[src_row, src_lane] = (cols % LANES).astype(np.int8)

    # --- full-grid permutation with pads mapped to pads ---
    full_dst_row = np.empty((K, LANES), np.int64)
    full_dst_lane = np.empty((K, LANES), np.int64)
    taken_src = np.zeros((K, LANES), bool)
    taken_dst = np.zeros((K, LANES), bool)
    taken_src[src_row, src_lane] = True
    taken_dst[dst_row, dst_lane] = True
    full_dst_row[src_row, src_lane] = dst_row
    full_dst_lane[src_row, src_lane] = dst_lane
    free_src = np.nonzero(~taken_src.reshape(-1))[0]
    free_dst = np.nonzero(~taken_dst.reshape(-1))[0]
    full_dst_row.reshape(-1)[free_src] = free_dst // LANES
    full_dst_lane.reshape(-1)[free_src] = free_dst % LANES

    route = plan_grid_permutation(full_dst_row, full_dst_lane, K)

    # destination values (zeros at pads)
    vals_dst = np.zeros((K2, LANES), vals.dtype)
    vals_dst[dst_row, dst_lane] = vals

    return {
        "M": M, "N": N, "S": S, "nc": nc, "nb": nb, "Kg": Kg, "K": K,
        "K2": K2, "D2": D2,
        "onehot": onehot, "blk_starts": blk_starts, "l_idx": l_idx,
        "route": route, "vals_dst": vals_dst,
    }


def build_spmv_fn(meta, dtype="float32"):
    """jax-traceable ``spmv(x, tables) -> y`` from plan metadata alone
    (the tables arrive as runtime arguments)."""
    import jax.numpy as jnp

    M, N, S = meta["M"], meta["N"], meta["S"]
    nb, Kg, K, K2, D2, nc = (meta["nb"], meta["Kg"], meta["K"],
                             meta["K2"], meta["D2"], meta["nc"])
    blk_starts = meta["blk_starts"]
    route_meta = {"K": K, "r": meta["r"]}

    # default TPU matmul precision rounds f32 operands to bf16 on the
    # MXU; the one-hot operand is exact either way, but x would lose
    # ~3 decimal digits — force full precision for f32 data
    import jax.lax as lax
    prec = (lax.Precision.HIGHEST if dtype == "float32"
            else lax.Precision.DEFAULT)

    def spmv(x, tables):
        xp = jnp.zeros(S * LANES, dtype=dtype).at[:N].set(
            x.astype(dtype))
        x2 = xp.reshape(S, LANES)
        # phase A: per-block one-hot matmul replicates segments
        parts = []
        for b in range(nb):
            r0, r1 = int(blk_starts[b]), int(blk_starts[b + 1])
            if r1 == r0:
                continue
            xb = x2[b * LANES:(b + 1) * LANES]
            if xb.shape[0] < LANES:
                xb = jnp.zeros((LANES, LANES), dtype).at[
                    :xb.shape[0]].set(xb)
            parts.append(
                jnp.dot(tables["onehot"][r0:r1].astype(dtype), xb,
                        preferred_element_type=dtype,
                        precision=prec))
        G = parts[0] if len(parts) == 1 else jnp.concatenate(parts, 0)
        if Kg < K:
            G = jnp.zeros((K, LANES), dtype).at[:Kg].set(G)
        G = lane_gather(G, tables["l_idx"])
        Q = apply_grid_permutation(G, route_meta, tables)
        P = Q[:K2] * tables["vals_dst"]
        Y2 = P.reshape(nc, D2, LANES).sum(axis=1)
        return Y2.reshape(nc * LANES)[:M]

    return spmv


def build_spmv(plan, dtype="float32"):
    """Return (spmv(x, tables), device tables) for a full plan."""
    import jax.numpy as jnp

    meta = {k: plan[k] for k in ("M", "N", "S", "nb", "Kg", "K", "K2",
                                 "D2", "nc", "blk_starts")}
    meta["r"] = plan["route"]["r"]
    consts = {
        "onehot": jnp.asarray(plan["onehot"], dtype=dtype),
        "l_idx": jnp.asarray(plan["l_idx"]),
        "vals_dst": jnp.asarray(plan["vals_dst"], dtype=dtype),
        "idx1": jnp.asarray(plan["route"]["idx1"]),
        "idxA": jnp.asarray(plan["route"]["idxA"]),
        "idxB": jnp.asarray(plan["route"]["idxB"]),
        "idxC": jnp.asarray(plan["route"]["idxC"]),
        "idx3": jnp.asarray(plan["route"]["idx3"]),
    }
    return build_spmv_fn(meta, dtype), consts


def spmv_np(plan_meta, x, onehot, l_idx, vals_dst, idx1, idxA, idxB,
            idxC, idx3):
    """Numpy oracle of the routed SpMV (PerformLinker / DebugMode)."""
    from pytensor_tpu.link.pallas.route import apply_grid_permutation_np

    M, N, S = plan_meta["M"], plan_meta["N"], plan_meta["S"]
    nb, Kg, K, K2, D2, nc = (plan_meta["nb"], plan_meta["Kg"],
                             plan_meta["K"], plan_meta["K2"],
                             plan_meta["D2"], plan_meta["nc"])
    blk_starts = plan_meta["blk_starts"]
    dtype = vals_dst.dtype
    xp = np.zeros(S * LANES, dtype=dtype)
    xp[:N] = x.astype(dtype)
    x2 = xp.reshape(S, LANES)
    parts = []
    for b in range(nb):
        r0, r1 = int(blk_starts[b]), int(blk_starts[b + 1])
        if r1 == r0:
            continue
        xb = x2[b * LANES:(b + 1) * LANES]
        if xb.shape[0] < LANES:
            pad = np.zeros((LANES, LANES), dtype)
            pad[:xb.shape[0]] = xb
            xb = pad
        parts.append(onehot[r0:r1].astype(dtype) @ xb)
    G = parts[0] if len(parts) == 1 else np.concatenate(parts, 0)
    if Kg < K:
        Gp = np.zeros((K, LANES), dtype)
        Gp[:Kg] = G
        G = Gp
    G = np.take_along_axis(G, l_idx, axis=1)
    plan = {"K": K, "r": K // LANES, "idx1": idx1, "idxA": idxA,
            "idxB": idxB, "idxC": idxC, "idx3": idx3}
    Q = apply_grid_permutation_np(G, plan)
    P = Q[:K2] * vals_dst
    Y2 = P.reshape(nc, D2, LANES).sum(axis=1)
    return Y2.reshape(nc * LANES)[:M]


# ---------------------------------------------------------------------------
# graph op + rewrite
# ---------------------------------------------------------------------------

class RoutedSpMV:
    """Placeholder for import order; real class defined below."""


def _define_op():
    from pytensor_tpu.graph.basic import Apply, Constant
    from pytensor_tpu.graph.op import Op
    from pytensor_tpu.tensor.basic import as_tensor_variable
    from pytensor_tpu.tensor.type import TensorType

    global RoutedSpMV

    class RoutedSpMV(Op):
        """Constant-pattern CSR matvec lowered to MXU matmuls + Mosaic
        lane gathers (tables as graph constants).  Created by
        ``local_structured_dot_to_routed``; reference parity:
        /root/reference/pytensor/sparse/basic.py:1340 StructuredDot."""

        __props__ = ("meta_key",)

        def __init__(self, meta, a_sparse=None):
            self.meta = dict(meta)
            self.meta["blk_starts"] = tuple(
                int(x) for x in meta["blk_starts"])
            self.meta_key = tuple(sorted(
                (k, v if not isinstance(v, tuple) else v)
                for k, v in self.meta.items()
                if k in ("M", "N", "S", "nb", "Kg", "K", "K2", "D2",
                         "nc", "r", "blk_starts")))
            # kept for L_op only (not part of equality)
            self.a_sparse = a_sparse

        def make_node(self, b, *tables):
            b = as_tensor_variable(b)
            out = TensorType(str(tables[2].type.dtype),
                             (self.meta["M"],))()
            return Apply(self, [b, *tables], [out])

        def perform(self, node, inputs, output_storage):
            b, onehot, l_idx, vals_dst, i1, iA, iB, iC, i3 = [
                np.asarray(v) for v in inputs]
            x = b[:, 0] if b.ndim == 2 else b
            y = spmv_np(self.meta, x, onehot, l_idx, vals_dst,
                        i1, iA, iB, iC, i3)
            output_storage[0][0] = np.asarray(
                y, dtype=node.outputs[0].type.numpy_dtype)

        def infer_shape(self, fgraph, node, input_shapes):
            return [(self.meta["M"],)]

        def L_op(self, inputs, outputs, output_grads):
            from pytensor_tpu.gradient import grad_not_implemented
            from pytensor_tpu.sparse.basic import (
                as_sparse_variable,
                structured_dot,
            )

            (gz,) = output_grads
            b = inputs[0]
            if self.a_sparse is not None:
                gb = structured_dot(
                    as_sparse_variable(self.a_sparse.T.tocsr()), gz)
                if b.type.ndim == 2:
                    from pytensor_tpu.tensor.shape import reshape

                    gb = reshape(gb, (self.meta["N"], 1))
                grads = [gb]
            else:
                grads = [grad_not_implemented(self, 0, b)]
            return grads + [grad_not_implemented(self, i + 1, t)
                            for i, t in enumerate(inputs[1:])]

    return RoutedSpMV


RoutedSpMV = _define_op()


def routed_spmv_graph(A, b_var):
    """Build the RoutedSpMV apply for scipy matrix ``A`` applied to the
    dense graph variable ``b_var`` ((N,) or (N,1)); None if ineligible."""
    import jax.numpy as jnp

    from pytensor_tpu.tensor.basic import constant

    plan = plan_spmv(A)
    if plan is None:
        return None
    dtype = str(b_var.type.dtype)
    route = plan["route"]
    tables = [
        constant(jnp.asarray(plan["onehot"], dtype=dtype), name="spmv_T"),
        constant(jnp.asarray(plan["l_idx"]), name="spmv_l"),
        constant(jnp.asarray(plan["vals_dst"], dtype=dtype),
                 name="spmv_v"),
        constant(jnp.asarray(route["idx1"]), name="spmv_i1"),
        constant(jnp.asarray(route["idxA"]), name="spmv_iA"),
        constant(jnp.asarray(route["idxB"]), name="spmv_iB"),
        constant(jnp.asarray(route["idxC"]), name="spmv_iC"),
        constant(jnp.asarray(route["idx3"]), name="spmv_i3"),
    ]
    meta = {k: plan[k] for k in ("M", "N", "S", "nb", "Kg", "K", "K2",
                                 "D2", "nc", "blk_starts")}
    meta["r"] = route["r"]
    op = RoutedSpMV(meta, a_sparse=A.tocsr())
    return op(b_var, *tables)


def _register():
    from pytensor_tpu.compile.mode import register_specialize
    from pytensor_tpu.config import config
    from pytensor_tpu.graph.basic import Constant
    from pytensor_tpu.graph.rewriting.basic import (
        copy_stack_trace,
        node_rewriter,
    )
    from pytensor_tpu.link.xla.dispatch import xla_funcify
    from pytensor_tpu.sparse.basic import StructuredDot

    @node_rewriter([StructuredDot])
    def local_structured_dot_to_routed(fgraph, node):
        """StructuredDot(A_const, b) -> RoutedSpMV for f32/bf16 matvec
        with a trace-time-constant pattern (the scatter/gather-free MXU
        + lane-gather lowering; see module docstring)."""
        import scipy.sparse as sp

        if not config.sparse__routed_spmv:
            return False
        a, b = node.inputs
        if not isinstance(a, Constant) or not sp.issparse(a.data):
            return False
        if str(node.outputs[0].type.dtype) not in ("float32", "bfloat16"):
            return False
        if b.type.ndim == 2:
            if b.type.shape[1] != 1:
                return False
        elif b.type.ndim != 1:
            return False
        if a.data.nnz < 4096:
            return False  # small: the segment-sum path is already fine
        try:
            out = routed_spmv_graph(a.data, b)
        except Exception:
            return False
        if out is None:
            return False
        if node.outputs[0].type.ndim == 2:
            from pytensor_tpu.tensor.shape import reshape

            out = reshape(out, (out.type.shape[0], 1))
        if not node.outputs[0].type.is_super(out.type):
            return False
        copy_stack_trace(node.outputs[0], out)
        return [out]

    register_specialize(local_structured_dot_to_routed,
                        name="local_structured_dot_to_routed")

    @xla_funcify.register(RoutedSpMV)
    def _routed_spmv(op, node=None, **kw):
        spmv_fn = build_spmv_fn(op.meta,
                                dtype=str(node.outputs[0].type.dtype))

        def run(b, onehot, l_idx, vals_dst, i1, iA, iB, iC, i3):
            x = b[:, 0] if b.ndim == 2 else b
            tables = {"onehot": onehot, "l_idx": l_idx,
                      "vals_dst": vals_dst, "idx1": i1, "idxA": iA,
                      "idxB": iB, "idxC": iC, "idx3": i3}
            return spmv_fn(x, tables)

        return run


_register()
