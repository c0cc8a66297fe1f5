"""Constant-permutation routing on (K, 128) grids via lane gathers.

Mosaic on this hardware supports exactly ONE data-dependent data-movement
primitive: ``tpu.dynamic_gather`` along the LANE dimension with indices
the same shape as the operand (jnp.take_along_axis(x, idx, axis=1),
x and idx both (M, 128)).  Sublane gathers do not compile.  This module
builds arbitrary (trace-time-constant) element permutations of a
(K, 128) grid out of that single primitive plus XLA transposes:

  stage 1   per-row lane permutation              (lane gather)
  stage 2   per-lane row permutation, decomposed Clos-style:
              A  block-local sublane permutation  (transpose+gather)
              S  major shuffle (beta,sigma)->(sigma,beta)
              B  block-local sublane permutation
              S' inverse shuffle
              C  block-local sublane permutation
  stage 3   per-row lane permutation              (lane gather)

Routing tables come from proper edge colorings of d-regular bipartite
multigraphs (Euler-split, d=128): level 1 colors elements by
(src_row -> dst_row) edges, giving each element an intermediate lane;
level 2 colors each lane's (src_block -> dst_block) edges, giving each
element an intermediate block position.  The colorings run in C
(link/c/routecolor.c) with a numpy fallback for small problems.

This is the engine behind the Pallas SpMV (sparse/spmv.py) — the
replacement for the reference's C sparse kernels
(/root/reference/pytensor/sparse/basic.py:1340) — and is generic: any
gather/scatter with a trace-time-constant pattern can be phrased as
(replication matmul) o (grid permutation).

Why it is fast: every pass is either an MXU matmul, an XLA transpose, or
a Mosaic lane gather; all touch each element O(1) times, so a full
permutation of 2M elements costs ~7 VMEM/HBM sweeps (~hundreds of
microseconds) instead of XLA's generic scatter/gather (~6 ns/element,
 >10 ms at that size).
"""

from __future__ import annotations

import numpy as np

LANES = 128


# ---------------------------------------------------------------------------
# edge coloring
# ---------------------------------------------------------------------------

def _edge_color_py(u, v, L, R, d):
    """Pure-python Euler-split coloring (fallback; O(E log d) but with
    python-loop constants — fine below ~200k edges)."""
    E = len(u)
    color = np.zeros(E, dtype=np.int32)
    groups = [np.arange(E, dtype=np.int64)]
    dd = d
    while dd > 1:
        new_groups = []
        for g in groups:
            bit = _orient_py(u[g], v[g], L, R)
            new_groups.append(g[bit == 0])
            new_groups.append(g[bit == 1])
            color[g] = color[g] * 2 + bit
        groups = new_groups
        dd //= 2
    return color


def _orient_py(u, v, L, R):
    """Euler orientation: bit[i]=0 iff edge i traversed left->right."""
    E = len(u)
    bit = np.zeros(E, dtype=np.int32)
    # incidence lists
    head = [-1] * (L + R)
    nxt = [0] * (2 * E)
    inc_edge = [0] * (2 * E)
    for i in range(E):
        a = int(u[i])
        b = L + int(v[i])
        nxt[2 * i] = head[a]
        head[a] = 2 * i
        inc_edge[2 * i] = i
        nxt[2 * i + 1] = head[b]
        head[b] = 2 * i + 1
        inc_edge[2 * i + 1] = i
    used = bytearray(E)
    for n in range(L + R):
        while head[n] != -1:
            cur = n
            while True:
                incid = head[cur]
                e = -1
                while incid != -1:
                    e = inc_edge[incid]
                    if not used[e]:
                        break
                    incid = nxt[incid]
                    e = -1
                head[cur] = incid
                if incid == -1:
                    break
                used[e] = 1
                if cur == u[e]:
                    bit[e] = 0
                    cur = L + int(v[e])
                else:
                    bit[e] = 1
                    cur = int(u[e])
    return bit


def edge_color(u, v, L, R, d):
    """Proper d-edge-coloring of a d-regular bipartite multigraph
    (d a power of two).  u, v: int32 edge endpoint arrays."""
    u = np.ascontiguousarray(u, dtype=np.int32)
    v = np.ascontiguousarray(v, dtype=np.int32)
    from pytensor_tpu.link.c.build import get_native_module

    mod = get_native_module("routecolor")
    if mod is not None:
        out = np.zeros(len(u), dtype=np.int32)
        mod.euler_color(u.tobytes(), v.tobytes(), int(L), int(R), int(d),
                        memoryview(out))
        return out
    return _edge_color_py(u, v, L, R, d)


# ---------------------------------------------------------------------------
# plan construction
# ---------------------------------------------------------------------------

def plan_grid_permutation(dst_row, dst_lane, K):
    """Routing tables moving element at source slot (i, j) to
    (dst_row[i, j], dst_lane[i, j]); the map must be a bijection of the
    (K, LANES) grid.  K = r * 128 with r a power of two <= 128."""
    r = K // LANES
    if r * LANES != K or r & (r - 1) or r > LANES:
        raise ValueError(f"K={K} must be 128*2^j with 2^j <= 128")
    dst_row = np.asarray(dst_row, dtype=np.int32).reshape(K, LANES)
    dst_lane = np.asarray(dst_lane, dtype=np.int32).reshape(K, LANES)

    src_row = np.repeat(np.arange(K, dtype=np.int32), LANES)
    src_lane = np.tile(np.arange(LANES, dtype=np.int32), K)
    dr = dst_row.reshape(-1)
    dl = dst_lane.reshape(-1)

    # level 1: intermediate lane per element
    c = edge_color(src_row, dr, K, K, LANES)

    # every stage gathers along LANES: indices are < 128, so the
    # tables ship as int8 (4x less HBM traffic; kernels upcast to i32)
    idx1 = np.empty((K, LANES), np.int8)
    idx1[src_row, c] = src_lane
    idx3 = np.empty((K, LANES), np.int8)
    idx3[dr, dl] = c

    # level 2: per intermediate lane, route rows through blocks
    order = np.argsort(c.astype(np.int64) * K + src_row, kind="stable")
    sr_l = src_row[order].reshape(LANES, K)
    dr_l = dr[order].reshape(LANES, K)
    beta = sr_l // LANES
    beta_p = dr_l // LANES
    m_l = np.empty((LANES, K), np.int32)  # colors < 128 (packed below)
    for lane in range(LANES):
        m_l[lane] = edge_color(beta[lane], beta_p[lane], r, r, LANES)
    m = np.empty(K * LANES, np.int32)
    m[order] = m_l.reshape(-1)

    sigma = src_row % LANES
    sigma_p = dr % LANES
    blk = src_row // LANES
    blk_p = dr // LANES

    # stage A: within src block, per lane: row sigma -> position m
    idxA = np.empty((K, LANES), np.int8)
    idxA[blk * LANES + c, m] = sigma
    # stage B: within shuffled window, per lane: beta -> beta'
    rs = m * r + blk            # shuffled source row
    rd = m * r + blk_p          # shuffled dest row (same 128-window)
    idxB = np.empty((K, LANES), np.int8)
    idxB[(rs // LANES) * LANES + c, rd % LANES] = rs % LANES
    # stage C: within dst block, per lane: position m -> row sigma'
    idxC = np.empty((K, LANES), np.int8)
    idxC[blk_p * LANES + c, sigma_p] = m

    return {"idx1": idx1, "idxA": idxA, "idxB": idxB, "idxC": idxC,
            "idx3": idx3, "K": K, "r": r}


# ---------------------------------------------------------------------------
# runtime application (jax)
# ---------------------------------------------------------------------------

def lane_gather(x, idx):
    """out[i, j] = x[i, idx[i, j]] — Mosaic dynamic_gather on TPU,
    jnp.take_along_axis elsewhere.  x, idx: (M, 128)."""
    import jax
    import jax.numpy as jnp

    if jax.default_backend() != "tpu":
        return jnp.take_along_axis(x, idx, axis=1)
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    M = x.shape[0]
    blk = M
    for cand in (2048, 1024, 512, 256, 128):
        if M % cand == 0:
            blk = cand
            break

    # explicit lax.gather in the exact form Mosaic lowers to
    # tpu.dynamic_gather (jnp.take_along_axis would build an internal
    # int64 iota under x64, which Mosaic rejects)
    dnums = lax.GatherDimensionNumbers(
        offset_dims=(),
        collapsed_slice_dims=(1,),
        start_index_map=(1,),
        operand_batching_dims=(0,),
        start_indices_batching_dims=(0,),
    )

    def kern(x_ref, i_ref, o_ref):
        o_ref[...] = lax.gather(
            x_ref[...], i_ref[...].astype(jnp.int32)[..., None], dnums,
            slice_sizes=(1, 1),
            mode=lax.GatherScatterMode.PROMISE_IN_BOUNDS)

    # index map: the column index must share the program id's i32 type —
    # a literal 0 becomes i64 under jax x64 and Mosaic fails to legalize
    imap = lambda i: (i, i * 0)  # noqa: E731
    return pl.pallas_call(
        kern,
        grid=(M // blk,),
        in_specs=[
            pl.BlockSpec((blk, LANES), imap, memory_space=pltpu.VMEM),
            pl.BlockSpec((blk, LANES), imap, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((blk, LANES), imap,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, LANES), x.dtype),
    )(x, idx)


def _block_sub(x, idx):
    """Per-lane, block-local sublane permutation via transpose + lane
    gather + transpose.  idx[(block*128 + lane), sigma'] = sigma."""
    import jax.numpy as jnp

    K = x.shape[0]
    r = K // LANES
    xt = jnp.transpose(x.reshape(r, LANES, LANES), (0, 2, 1)) \
        .reshape(r * LANES, LANES)
    g = lane_gather(xt, idx)
    return jnp.transpose(g.reshape(r, LANES, LANES), (0, 2, 1)) \
        .reshape(K, LANES)


def apply_grid_permutation(x, plan, idx_arrays=None):
    """Route x (K, LANES) through a plan from plan_grid_permutation.
    ``idx_arrays`` optionally supplies the five index arrays as device
    values (so they are jit arguments, not HLO literals)."""
    import jax.numpy as jnp

    K, r = plan["K"], plan["r"]
    ia = idx_arrays if idx_arrays is not None else plan
    x = lane_gather(x, ia["idx1"])
    x = _block_sub(x, ia["idxA"])
    x = jnp.transpose(x.reshape(r, LANES, LANES), (1, 0, 2)) \
        .reshape(K, LANES)
    x = _block_sub(x, ia["idxB"])
    x = jnp.transpose(x.reshape(LANES, r, LANES), (1, 0, 2)) \
        .reshape(K, LANES)
    x = _block_sub(x, ia["idxC"])
    x = lane_gather(x, ia["idx3"])
    return x


def apply_grid_permutation_np(x, plan):
    """Numpy oracle of apply_grid_permutation (for tests)."""
    K, r = plan["K"], plan["r"]

    def lg(x, idx):
        return np.take_along_axis(x, idx, axis=1)

    def bs(x, idx):
        xt = x.reshape(r, LANES, LANES).transpose(0, 2, 1) \
            .reshape(r * LANES, LANES)
        g = lg(xt, idx)
        return g.reshape(r, LANES, LANES).transpose(0, 2, 1) \
            .reshape(K, LANES)

    x = lg(x, plan["idx1"])
    x = bs(x, plan["idxA"])
    x = x.reshape(r, LANES, LANES).transpose(1, 0, 2).reshape(K, LANES)
    x = bs(x, plan["idxB"])
    x = x.reshape(LANES, r, LANES).transpose(1, 0, 2).reshape(K, LANES)
    x = bs(x, plan["idxC"])
    x = lg(x, plan["idx3"])
    return x
