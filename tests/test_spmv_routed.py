"""Routed SpMV (sparse/spmv.py) + the grid-permutation router
(link/pallas/route.py): correctness vs scipy and the numpy oracle.

Reference parity: /root/reference/pytensor/sparse/basic.py:1340
(StructuredDot) — same semantics, TPU-native lowering.
"""

import numpy as np
import pytest
import scipy.sparse as sp

import pytensor_tpu as ptt
import pytensor_tpu.tensor as pt
from pytensor_tpu.link.pallas.route import (
    LANES,
    apply_grid_permutation_np,
    edge_color,
    plan_grid_permutation,
)
from pytensor_tpu.sparse import as_sparse_variable, structured_dot
from pytensor_tpu.sparse.spmv import build_spmv, plan_spmv, spmv_np


class TestEdgeColor:
    @pytest.mark.parametrize("L,d", [(8, 2), (64, 8), (32, 128)])
    def test_proper_coloring(self, L, d):
        rng = np.random.default_rng(L * d)
        u = np.repeat(np.arange(L, dtype=np.int32), d)
        v = rng.permuted(np.repeat(np.arange(L, dtype=np.int32), d)).astype(
            np.int32)
        c = edge_color(u, v, L, L, d)
        assert c.min() >= 0 and c.max() < d
        assert len(set(zip(u.tolist(), c.tolist()))) == len(u)
        assert len(set(zip(v.tolist(), c.tolist()))) == len(v)

    def test_python_fallback_matches_contract(self):
        from pytensor_tpu.link.pallas.route import _edge_color_py

        rng = np.random.default_rng(7)
        L, d = 16, 4
        u = np.repeat(np.arange(L, dtype=np.int32), d)
        v = rng.permuted(np.repeat(np.arange(L, dtype=np.int32), d)).astype(
            np.int32)
        c = _edge_color_py(u, v, L, L, d)
        assert len(set(zip(u.tolist(), c.tolist()))) == len(u)
        assert len(set(zip(v.tolist(), c.tolist()))) == len(v)


class TestGridRoute:
    @pytest.mark.parametrize("r", [1, 2, 4])
    def test_random_permutation_routes(self, r):
        rng = np.random.default_rng(r)
        K = r * LANES
        perm = rng.permutation(K * LANES)
        dst_row = (perm // LANES).reshape(K, LANES)
        dst_lane = (perm % LANES).reshape(K, LANES)
        plan = plan_grid_permutation(dst_row, dst_lane, K)
        x = rng.standard_normal((K, LANES)).astype("float32")
        out = apply_grid_permutation_np(x, plan)
        expect = np.empty_like(x)
        expect[dst_row.reshape(-1), dst_lane.reshape(-1)] = x.reshape(-1)
        np.testing.assert_array_equal(out, expect)

    def test_jax_matches_numpy(self):
        import jax

        from pytensor_tpu.link.pallas.route import apply_grid_permutation

        rng = np.random.default_rng(9)
        K = 2 * LANES
        perm = rng.permutation(K * LANES)
        plan = plan_grid_permutation(perm // LANES, perm % LANES, K)
        x = rng.standard_normal((K, LANES)).astype("float32")
        tables = {k: np.asarray(v) for k, v in plan.items()
                  if k.startswith("idx")}
        out = np.asarray(jax.jit(
            lambda x: apply_grid_permutation(x, plan, tables))(x))
        np.testing.assert_array_equal(out, apply_grid_permutation_np(x, plan))


class TestRoutedSpmv:
    @pytest.mark.parametrize("M,N,dens", [
        (300, 260, 0.05), (128, 128, 0.1), (1000, 700, 0.01),
        (64, 500, 0.02), (513, 513, 0.03),
    ])
    def test_matches_scipy(self, M, N, dens):
        import jax

        rng = np.random.default_rng(M + N)
        A = sp.random(M, N, density=dens, format="csr", random_state=rng,
                      dtype="float32")
        plan = plan_spmv(A)
        assert plan is not None
        fn, consts = build_spmv(plan)
        x = rng.standard_normal(N).astype("float32")
        y = np.asarray(jax.jit(lambda x, t: fn(x, t))(x, consts))
        np.testing.assert_allclose(y, A @ x, atol=1e-4)

    def test_numpy_oracle_matches(self):
        rng = np.random.default_rng(4)
        A = sp.random(200, 150, density=0.05, format="csr",
                      random_state=rng, dtype="float32")
        plan = plan_spmv(A)
        meta = {k: plan[k] for k in ("M", "N", "S", "nb", "Kg", "K", "K2",
                                     "D2", "nc", "blk_starts")}
        x = rng.standard_normal(150).astype("float32")
        r = plan["route"]
        y = spmv_np(meta, x, plan["onehot"], plan["l_idx"],
                    plan["vals_dst"], r["idx1"], r["idxA"], r["idxB"],
                    r["idxC"], r["idx3"])
        np.testing.assert_allclose(y, A @ x, atol=1e-4)

    def test_graph_rewrite_fires_and_matches(self):
        rng = np.random.default_rng(5)
        n = 1500
        A = sp.random(n, n, density=0.005, format="csr", random_state=rng,
                      dtype="float32")
        x = pt.tensor("x", dtype="float32", shape=(n, 1))
        y = structured_dot(as_sparse_variable(A), x)
        f = ptt.function([x], y)
        ops = [type(nd.op).__name__ for nd in f.fgraph.toposort()]
        assert "RoutedSpMV" in ops
        xv = rng.standard_normal((n, 1)).astype("float32")
        np.testing.assert_allclose(np.asarray(f(xv)), A @ xv, atol=1e-4)

    def test_oracle_linker_matches(self):
        from pytensor_tpu.compile.mode import get_mode

        rng = np.random.default_rng(6)
        n = 1200
        A = sp.random(n, n, density=0.01, format="csr", random_state=rng,
                      dtype="float32")
        x = pt.tensor("x", dtype="float32", shape=(n,))
        y = structured_dot(as_sparse_variable(A), x)
        f = ptt.function([x], y, mode=get_mode("PY"))
        ops = [type(nd.op).__name__ for nd in f.fgraph.toposort()]
        assert "RoutedSpMV" in ops
        xv = rng.standard_normal(n).astype("float32")
        np.testing.assert_allclose(np.asarray(f(xv)), A @ xv, atol=1e-4)

    def test_gradient_through_routed(self):
        rng = np.random.default_rng(8)
        n = 1500
        A = sp.random(n, n, density=0.005, format="csr", random_state=rng,
                      dtype="float32")
        x = pt.tensor("x", dtype="float32", shape=(n,))
        y = structured_dot(as_sparse_variable(A), x)
        # grad built BEFORE the specialize rewrite runs (the normal flow)
        g = ptt.grad(pt.sum(y * y), x)
        f = ptt.function([x], g)
        xv = rng.standard_normal(n).astype("float32")
        expect = 2 * (A.T @ (A @ xv))
        np.testing.assert_allclose(np.asarray(f(xv)), expect,
                                   atol=1e-3, rtol=1e-4)

    def test_small_matrix_keeps_segment_path(self):
        rng = np.random.default_rng(10)
        A = sp.random(80, 80, density=0.05, format="csr", random_state=rng,
                      dtype="float32")  # nnz < 4096 gate
        x = pt.tensor("x", dtype="float32", shape=(80,))
        f = ptt.function([x], structured_dot(as_sparse_variable(A), x))
        ops = [type(nd.op).__name__ for nd in f.fgraph.toposort()]
        assert "RoutedSpMV" not in ops

    def test_f64_keeps_segment_path(self):
        rng = np.random.default_rng(11)
        A = sp.random(1500, 1500, density=0.01, format="csr",
                      random_state=rng, dtype="float64")
        x = pt.tensor("x", dtype="float64", shape=(1500,))
        f = ptt.function([x], structured_dot(as_sparse_variable(A), x))
        ops = [type(nd.op).__name__ for nd in f.fgraph.toposort()]
        assert "RoutedSpMV" not in ops

    def test_flag_disables(self):
        from pytensor_tpu.config import config

        rng = np.random.default_rng(12)
        A = sp.random(1500, 1500, density=0.01, format="csr",
                      random_state=rng, dtype="float32")
        x = pt.tensor("x", dtype="float32", shape=(1500,))
        with config.change_flags(sparse__routed_spmv=False):
            f = ptt.function([x], structured_dot(as_sparse_variable(A), x))
        ops = [type(nd.op).__name__ for nd in f.fgraph.toposort()]
        assert "RoutedSpMV" not in ops


class TestTrainLoopShapeSpecialization:
    """train_loop pins loop-carried state to the current shared-value
    shape (compile/train.py), so shape-gated specializations — here the
    routed SpMV — fire inside the loop body even when the shared
    variable's declared type has unknown dims."""

    def test_routed_fires_inside_train_loop(self):
        rng = np.random.default_rng(13)
        n = 1500
        A = sp.random(n, n, density=0.005, format="csr", random_state=rng,
                      dtype="float32")
        x0 = rng.standard_normal((n, 1)).astype("float32")
        xsh = ptt.shared(x0, name="x")  # type has shape (?, ?)
        assert xsh.type.shape == (None, None)
        y = structured_dot(as_sparse_variable(A), xsh)
        upd = y / (pt.max(pt.abs(y)) + 1e-9)
        f = ptt.train_loop([], pt.sum(y), {xsh: upd}, n_steps=3)

        from pytensor_tpu.scan.op import Scan

        inner_ops = []
        for node in f.fgraph.apply_nodes:
            if isinstance(node.op, Scan):
                inner_ops = [type(nd.op).__name__
                             for nd in node.op.fgraph.apply_nodes]
        assert "RoutedSpMV" in inner_ops

        # numerics: 3 power-iteration steps equal the numpy loop
        v = x0
        for _ in range(3):
            yv = A @ v
            v = yv / (np.max(np.abs(yv)) + 1e-9)
        np.testing.assert_allclose(float(np.asarray(f())), float(yv.sum()),
                                   rtol=2e-4)
        np.testing.assert_allclose(np.asarray(xsh.get_value()), v, atol=2e-5)
