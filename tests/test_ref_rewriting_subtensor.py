"""Reference rewriting/test_subtensor.py corpus (part 1: write/read
rewrites, uniqueness analysis, slice canonicalization, arange forms).

Cases mirror /root/reference/tests/tensor/rewriting/test_subtensor.py
(test_local_useless_inc_subtensor, test_local_add_of_sparse_write,
TestIndexProvablyUniqueArange, TestLocalUselessSubtensor,
TestSubtensorIncSubtensor, TestLocalSubtensorMerge,
TestReadOfWriteSameIndices, TestReadOfWriteConstantIndices,
TestWriteOfWriteSameIndices, TestSubtensorAllocRewrites,
test_local_set_to_inc_subtensor*, TestUselessSlice, TestArangeRewrites,
test_cholesky_unconstrain_grad, test_local_convert_negative_indices)
against pytensor_tpu/tensor/rewriting/subtensor.py.

Divergences from the reference noted per test:
- no DeepCopyOp wrapper here -> assertions count Subtensor-family ops
  instead of asserting a 1-node DeepCopy program;
- local_uint_constant_indices is N/A on XLA (HLO indices are i32/i64,
  there is no uint8 fast path) -> not ported;
- inplace markers are N/A (XLA donation analysis replaces destructive
  optimization) -> inplace tests assert values only.
"""

import numpy as np
import pytest

import pytensor_tpu as ptt
import pytensor_tpu.tensor as pt
from pytensor_tpu.assumptions import assume
from pytensor_tpu.compile.mode import Mode, get_default_mode
from pytensor_tpu.graph.rewriting.basic import in2out
from pytensor_tpu.graph.rewriting.utils import rewrite_graph
from pytensor_tpu.tensor.subtensor import (
    AdvancedIncSubtensor,
    AdvancedIncSubtensor1,
    AdvancedSubtensor,
    AdvancedSubtensor1,
    IncSubtensor,
    Subtensor,
)
from tests.utils import assert_equal_computations, compare_xla_and_py

RNG = np.random.default_rng(42)

WRITE_OPS = (IncSubtensor, AdvancedIncSubtensor, AdvancedIncSubtensor1)
READ_OPS = (Subtensor, AdvancedSubtensor, AdvancedSubtensor1)


def _nodes(f, kinds):
    return [n for n in f.fgraph.toposort() if isinstance(n.op, kinds)]


def _opt(expr, include=("canonicalize", "specialize")):
    # "merge" unifies structurally-equal index subgraphs (two x[:stop]
    # builds) so identity-based matches fire, as in a full compile;
    # onehot_gather is an opt-in TPU tag (not fast_run) whose matmul
    # forms would obscure the slice forms these tests pin
    return rewrite_graph(expr, include=tuple(include) + ("merge",),
                         exclude=("onehot_gather",))


def _oracle(inputs, outputs):
    return ptt.function(inputs, outputs, mode="FAST_COMPILE",
                        on_unused_input="ignore")


class TestUselessIncSubtensor:
    """Reference test_local_useless_inc_subtensor:70."""

    @pytest.mark.parametrize("s", [slice(None), slice(None, None, -1)],
                             ids=["full", "reversed"])
    @pytest.mark.parametrize("op", ["set", "inc"])
    def test_full_slice_with_shape_info(self, op, s):
        from pytensor_tpu.tensor.shape import specify_shape

        x = pt.dmatrix("x")
        y = pt.dmatrix("y")
        view = x[:, s]
        o = (pt.set_subtensor(view, specify_shape(y, x.shape)) if op == "set"
             else pt.inc_subtensor(view, specify_shape(y, x.shape)))
        f = ptt.function([x, y], o)
        assert not _nodes(f, WRITE_OPS)
        dx = np.asarray([[2.0, 3.0]])
        dy = np.asarray([[3.0, 4.0]])
        expected = (dx + dy[:, s]) if op == "inc" else dy[:, s]
        np.testing.assert_array_equal(np.asarray(f(dx, dy)), expected)

    def test_increment_zeros(self):
        """inc on an entire zeros array -> the increment (ref :115)."""
        from pytensor_tpu.tensor.shape import specify_shape

        y = pt.dmatrix("y")
        s = pt.zeros((2, 2))[:, :]
        o = pt.inc_subtensor(s, specify_shape(y, s.shape))
        f = ptt.function([y], o)
        assert not _nodes(f, WRITE_OPS)
        dy = np.asarray([[3.0, 4.0], [5.0, 6.0]])
        np.testing.assert_array_equal(np.asarray(f(dy)), dy)

    def test_no_opt_stepped_slice(self):
        """Stepped slices can't be removed (ref :126)."""
        from pytensor_tpu.tensor.shape import specify_shape

        x = pt.dmatrix("x")
        y = pt.dmatrix("y")
        s = x[:, ::2]
        o = pt.set_subtensor(s, specify_shape(y, s.shape))
        f = ptt.function([x, y], o)
        dx = np.asarray([[2.0, 3.0, 6.0, 7.0]])
        dy = np.asarray([[8.0, 9.0]])
        exp = dx.copy()
        exp[:, ::2] = dy
        np.testing.assert_array_equal(np.asarray(f(dx, dy)), exp)

    def test_full_inc_collapses_to_add(self):
        """inc over a full slice collapses to x + y (ref :139)."""
        from pytensor_tpu.tensor.shape import specify_shape

        x = pt.dmatrix("x")
        y = pt.dmatrix("y")
        o = pt.inc_subtensor(x[:, :], specify_shape(y, x.shape))
        f = ptt.function([x, y], o)
        assert not _nodes(f, WRITE_OPS)
        dx = np.asarray([[1.0, 2.0], [3.0, 4.0]])
        dy = np.asarray([[10.0, 20.0], [30.0, 40.0]])
        np.testing.assert_array_equal(np.asarray(f(dx, dy)), dx + dy)


class TestAddOfSparseWrite:
    """x + set/inc(zeros, v, idx) -> x[idx].inc(v) (ref :155)."""

    def _rewriter(self):
        from pytensor_tpu.tensor.rewriting.subtensor import \
            local_add_of_sparse_write

        return in2out(local_add_of_sparse_write, name="add_of_sparse_write")

    def test_set_unique_constant(self):
        x = pt.dvector("x")
        v = pt.dvector("v")
        cst = np.array([1, 3])
        out = x + pt.zeros(x.shape, dtype="float64")[cst].set(v)
        rewritten = rewrite_graph(out, include=(),
                                  custom_rewrite=self._rewriter())
        assert rewritten.owner is not None
        assert isinstance(rewritten.owner.op, WRITE_OPS)
        assert not rewritten.owner.op.set_instead_of_inc
        dx = np.array([1.0, 2.0, 3.0, 4.0, 5.0])
        dv = np.array([10.0, 20.0])
        exp = dx.copy()
        exp[[1, 3]] += dv
        f = _oracle([x, v], rewritten)
        np.testing.assert_allclose(np.asarray(f(dx, dv)), exp)

    def test_set_symbolic_idx_not_rewritten(self):
        """A dense set is last-wins: possibly-duplicated indices block."""
        x = pt.dvector("x")
        v = pt.dvector("v")
        idx = pt.ivector("idx")
        out = x + pt.zeros(x.shape, dtype="float64")[idx].set(v)
        rewritten = rewrite_graph(out, include=(),
                                  custom_rewrite=self._rewriter())
        assert_equal_computations([rewritten], [out])
        # soundness at a duplicated index against the oracle
        f = _oracle([x, v, idx], out)
        dx = np.array([1.0, 2.0, 3.0, 4.0, 5.0])
        dv = np.array([10.0, 20.0])
        didx = np.array([1, 1], dtype="int32")
        exp = dx.copy()
        exp[1] = 2.0 + 20.0  # x plus the last-wins set value
        np.testing.assert_allclose(np.asarray(f(dx, dv, didx)), exp)

    def test_inc_symbolic_idx_rewritten_unconditionally(self):
        """inc accumulates the same delta either way, duplicates included."""
        x = pt.dvector("x")
        v = pt.dvector("v")
        idx = pt.ivector("idx")
        out = x + pt.zeros(x.shape, dtype="float64")[idx].inc(v)
        rewritten = rewrite_graph(out, include=(),
                                  custom_rewrite=self._rewriter())
        expected = x[idx].inc(v)
        assert_equal_computations([rewritten], [expected])
        f = _oracle([x, v, idx], rewritten)
        dx = np.array([1.0, 2.0, 3.0, 4.0, 5.0])
        dv = np.array([10.0, 20.0])
        didx = np.array([1, 1], dtype="int32")
        exp = dx.copy()
        np.add.at(exp, didx, dv)
        np.testing.assert_allclose(np.asarray(f(dx, dv, didx)), exp)

    def test_basic_scalar_inc(self):
        x = pt.dvector("x")
        v = pt.dvector("v")
        s = pt.iscalar("s")
        out = x + pt.zeros(x.shape, dtype="float64")[s].inc(v[0])
        rewritten = rewrite_graph(out, include=(),
                                  custom_rewrite=self._rewriter())
        assert rewritten.owner is not None
        assert isinstance(rewritten.owner.op, IncSubtensor)

    def test_set_jointly_unique_advanced(self):
        """Neither axis unique alone; joint tuples distinct (ref :224)."""
        X = pt.dmatrix("X")
        v = pt.dvector("v")
        rows = pt.constant(np.array([0, 1, 1], dtype="int32"))
        cols = pt.constant(np.array([0, 0, 1], dtype="int32"))
        out = X + pt.zeros(X.shape, dtype="float64")[rows, cols].set(v)
        rewritten = rewrite_graph(out, include=(),
                                  custom_rewrite=self._rewriter())
        assert isinstance(rewritten.owner.op, WRITE_OPS)
        assert not rewritten.owner.op.set_instead_of_inc

    def test_set_jointly_duplicated_not_rewritten(self):
        X = pt.dmatrix("X")
        v = pt.dvector("v")
        rows = pt.constant(np.array([0, 1, 1], dtype="int32"))
        cols = pt.constant(np.array([0, 1, 1], dtype="int32"))
        out = X + pt.zeros(X.shape, dtype="float64")[rows, cols].set(v)
        rewritten = rewrite_graph(out, include=(),
                                  custom_rewrite=self._rewriter())
        assert_equal_computations([rewritten], [out])

    def test_leading_slice_with_unique_advanced(self):
        """Symbolic slice bounds must not read as advanced indices (ref
        :245)."""
        X = pt.dmatrix("X")
        w = pt.dmatrix("w")
        u = pt.constant(np.array([0, 2], dtype="int32"))
        lo, hi = pt.iscalar("lo"), pt.iscalar("hi")
        out = X + pt.zeros(X.shape, dtype="float64")[lo:hi, u].set(w)
        rewritten = rewrite_graph(out, include=(),
                                  custom_rewrite=self._rewriter())
        assert isinstance(rewritten.owner.op, WRITE_OPS)
        assert not rewritten.owner.op.set_instead_of_inc

    def test_end_to_end_value(self):
        """The default pipeline folds it; numerics agree with the oracle."""
        x = pt.dvector("x")
        v = pt.dvector("v")
        out = x + pt.zeros(x.shape, dtype="float64")[np.array([1, 3])].set(v)
        compare_xla_and_py([x, v], out,
                           [np.arange(5.0), np.array([10.0, 20.0])])


class TestIndexProvablyUniqueArange:
    """Reference TestIndexProvablyUniqueArange:260."""

    @staticmethod
    def unique(idx):
        from pytensor_tpu.tensor.rewriting.subtensor import \
            _index_provably_unique

        return _index_provably_unique(idx)

    def test_arange(self):
        k = pt.iscalar("k")
        n = pt.dvector("v").shape[0]
        unique = self.unique

        assert unique(pt.arange(k)) is True
        assert unique(pt.arange(n)) is True  # shapes are >= 0
        assert unique(pt.arange(2, k)) is True
        assert unique(pt.arange(n, 0, -1)) is True
        assert unique(pt.arange(k, 0, -1)) is True
        assert unique(pt.arange(k, 5, -1)) is True
        assert unique(pt.arange(-1, k, -1)) is True

        assert unique(pt.arange(2, 6)) is True
        assert unique(pt.arange(-6, -2)) is True
        assert unique(pt.arange(5, -1, -1)) is True
        assert unique(pt.arange(6, -2, -2)) is True
        assert unique(pt.arange(-5, 1, 3)) is True
        assert unique(pt.arange(-1, -6, -1)) is True

        assert unique(pt.arange(-2, 2)) is False
        assert unique(pt.arange(0, -5, -1)) is False

    def test_shifted_arange(self):
        k = pt.iscalar("k")
        unique = self.unique

        assert unique(pt.arange(-5, 5) + 5) is True
        assert unique(pt.arange(-5, 5) + 6) is True
        assert unique(pt.arange(5) - 10) is True
        assert unique(pt.arange(-5, 5) + 1) is False
        assert unique(pt.arange(5) - 2) is False

        assert unique(pt.arange(k) + 2) is True
        assert unique(2 + pt.arange(k)) is True
        assert unique(pt.arange(k) - 2) is False

        assert unique(pt.arange(10, 0, -1) + 5) is True
        assert unique(pt.arange(10, 0, -1) - 5) is False
        assert unique(pt.arange(-1, -9, -2) - 1) is True
        assert unique(pt.arange(-1, -9, -2) + 1) is False

        assert unique(pt.arange(5) + 200) is True
        assert unique(pt.arange(5) - 200) is True

        assert unique(pt.arange(k) + pt.lvector("i")) is False
        assert unique(pt.arange(k) + pt.arange(k)) is False

        assert unique(pt.arange(5, k, -1)) is False
        assert unique(pt.arange(k, 5)) is False
        assert unique(pt.arange(k, -5, -1)) is False

    def test_constants_and_masks(self):
        unique = self.unique
        assert unique(pt.constant(np.array([0, 2, 3]))) is True
        assert unique(pt.constant(np.array([0, 2, 2]))) is False
        # 0 and -2 alias in a 2-row buffer
        assert unique(pt.constant(np.array([0, -2]))) is False
        assert unique(pt.vector("m", dtype="bool")) is True
        assert unique(pt.ivector("i")) is False
        idx = assume(pt.ivector("i"), "unique_indices")
        assert unique(idx) is True


class TestLocalUselessSubtensor:
    """Reference TestLocalUselessSubtensor:347."""

    @pytest.mark.parametrize("idx", [
        (slice(0, None),),
        (slice(0, None), slice(0, None)),
    ])
    def test_full_slices_removed(self, idx):
        x = pt.dmatrix("x")
        f = ptt.function([x], pt.exp(x).__getitem__(idx))
        assert not _nodes(f, READ_OPS)
        xv = np.array([[0.0, 1.0, 2.0], [3.0, 4.0, 5.0]])
        np.testing.assert_allclose(np.asarray(f(xv)), np.exp(xv)[idx],
                                   rtol=1e-12)

    @pytest.mark.parametrize("idx, removed", [
        ((slice(0, 2),), True),
        ((slice(0, 2), slice(0, None)), True),
        ((slice(0, 2), slice(0, 3)), True),
        ((slice(0, None), slice(0, 3)), True),
        ((slice(0, 3), slice(0, 13)), True),
        ((slice(0, 3), slice(0, 2)), False),
        ((slice(0, 1), slice(0, None)), False),
        ((slice(0, 1), 1), False),
    ])
    def test_static_shape_bounds(self, idx, removed):
        """Slices covering the whole statically-known dim are useless."""
        x = pt.tensor("x", shape=(2, 3), dtype="float64")
        f = ptt.function([x], pt.exp(x).__getitem__(idx))
        if removed:
            assert not _nodes(f, READ_OPS)
        else:
            assert _nodes(f, READ_OPS)
        xv = np.array([[0.0, 1.0, 2.0], [3.0, 4.0, 5.0]])
        np.testing.assert_allclose(np.asarray(f(xv)), np.exp(xv)[idx],
                                   rtol=1e-12)

    @pytest.mark.parametrize("idx_fn, removed", [
        (lambda x: (slice(0, x.shape[0]),), True),
        (lambda x: (slice(0, x.shape[1]),), False),
        (lambda x: (slice(0, x.shape[0]), slice(0, x.shape[1])), True),
        (lambda x: (slice(0, x.shape[0]), slice(0, x.shape[0])), False),
        (lambda x: (slice(0, x.shape[1]), slice(0, x.shape[0])), False),
        (lambda x: (slice(0, x.shape[1]), 2), False),
    ])
    def test_symbolic_shape_bounds(self, idx_fn, removed):
        """x[:x.shape[0]] is useless even without static shapes."""
        x = pt.dmatrix("x")
        idx = idx_fn(x)
        f = ptt.function([x], pt.exp(x).__getitem__(idx))
        if removed:
            assert not _nodes(f, READ_OPS)
        else:
            assert _nodes(f, READ_OPS)
        xv = np.array([[0.0, 1.0, 2.0], [3.0, 4.0, 5.0]])
        np.testing.assert_allclose(np.asarray(f(xv)),
                                   np.exp(xv)[idx_fn(xv)], rtol=1e-12)

    def test_scalar_bound_not_removed(self):
        """x[:s] for a free scalar s must stay (ref :503)."""
        x = pt.dmatrix("x")
        s = pt.iscalar("s")
        f = ptt.function([x, s], pt.exp(x)[:s])
        assert _nodes(f, READ_OPS)
        xv = np.array([[0.0, 1.0, 2.0], [3.0, 4.0, 5.0]])
        for sv in (1, 2):
            np.testing.assert_allclose(np.asarray(f(xv, sv)),
                                       np.exp(xv)[:sv], rtol=1e-12)

    @pytest.mark.parametrize("idx, removed", [
        ([0, 1], True),
        ([1, 0], False),
        ([0, 0], False),
        ([0, 0, 1], False),
        ("arange2", True),
        ("arange02", True),
        ("arange022", False),
        ("arange12", False),
    ])
    def test_advanced_identity_index(self, idx, removed):
        """x[[0..n-1]] over a statically (n,)-shaped dim is useless (ref
        :540)."""
        x = pt.tensor("x", shape=(2, 3), dtype="float64")
        sym = {"arange2": lambda: pt.arange(2),
               "arange02": lambda: pt.arange(0, 2),
               "arange022": lambda: pt.arange(0, 2, 2),
               "arange12": lambda: pt.arange(1, 2)}
        index = sym[idx]() if isinstance(idx, str) else idx
        f = ptt.function([x], pt.exp(x).__getitem__(index))
        if removed:
            assert not _nodes(f, READ_OPS)
        xv = np.array([[0.0, 1.0, 2.0], [3.0, 4.0, 5.0]])
        idx_val = (np.arange(*{"arange2": (2,), "arange02": (0, 2),
                               "arange022": (0, 2, 2),
                               "arange12": (1, 2)}[idx])
                   if isinstance(idx, str) else idx)
        np.testing.assert_allclose(np.asarray(f(xv)), np.exp(xv)[idx_val],
                                   rtol=1e-12)


def test_local_subtensor_remove_broadcastable_index():
    """Indexing a size-1 inserted dim with 0/-1 folds into DimShuffle
    (ref :566)."""
    x = pt.dmatrix("x")
    y1 = x.dimshuffle(0, "x", 1)
    y2 = x.dimshuffle("x", 1, 0, "x")
    y3 = x.dimshuffle("x", 1, "x", 0, "x")

    exprs = [y1[:, 0, :], y1[:, -1, :], y2[0, :, :, -1], y2[0, :, :, 0],
             y2[-1, :, :, -1], y3[-1, :, 0, :, -1], y3[-1, :, -1, :, -1],
             y3[0, :, 0, :, 0]]
    f = ptt.function([x], exprs)
    assert not _nodes(f, READ_OPS + WRITE_OPS)
    xv = RNG.random((5, 5))
    res = f(xv)
    n1 = xv[:, None, :]
    n2 = xv.T[None, :, :, None]
    n3 = xv.T[None, :, None, :, None]
    expected = [n1[:, 0, :], n1[:, -1, :], n2[0, :, :, -1], n2[0, :, :, 0],
                n2[-1, :, :, -1], n3[-1, :, 0, :, -1], n3[-1, :, -1, :, -1],
                n3[0, :, 0, :, 0]]
    for r, e in zip(res, expected):
        np.testing.assert_array_equal(np.asarray(r), e)

    # cases the rewrite must pass through unharmed
    w = [y1[3, 0, :], y1[2:4, -1, :], y2[0, :, 4:, -1], y2[:, :, 0, -1],
         y2[0, 2:4, :, 0], y3[-1, 2, 0, :, -1], y3[0, 0, 0, :, 0],
         y3[-1, 2:4, 0, 1:5, -1], y3[:, 0, :, 1], y3[:, 3]]
    f2 = ptt.function([x], w)
    f2(xv)


class TestSubtensorIncSubtensor:
    """set(x[idx], v)[idx] -> v (reference TestSubtensorIncSubtensor:648)."""

    def test_basic(self):
        x = pt.dmatrix("x")
        i = pt.iscalar("i")
        v = pt.dvector("v")
        z = pt.set_subtensor(x[i], v)[i]
        f = ptt.function([x, i, v], z)
        assert not _nodes(f, WRITE_OPS)
        x_ = RNG.uniform(size=(3, 4))
        v_ = RNG.uniform(size=(4,))
        np.testing.assert_array_equal(np.asarray(f(x_, 1, v_)), v_)

    def test_multiple_idx(self):
        x = pt.tensor4("x", dtype="float64")
        i1, i2, i3, i4 = (pt.iscalar(n) for n in "abcd")
        v = pt.tensor3("v", dtype="float64")
        z = pt.set_subtensor(x[i1, :i2, i3:, ::i4], v)[i1, :i2, i3:, ::i4]
        f = ptt.function([x, i1, i2, i3, i4, v], z)
        assert not _nodes(f, WRITE_OPS)
        x_ = RNG.uniform(size=(3, 4, 5, 6))
        v_ = RNG.uniform(size=(2, 2, 2))
        np.testing.assert_array_equal(np.asarray(f(x_, 1, 2, 3, 4, v_)), v_)

    def test_not_applied(self):
        """Different read indices must keep both ops (ref :742)."""
        x = pt.tensor4("x", dtype="float64")
        i1, i2, i3, i4 = (pt.iscalar(n) for n in "abcd")
        v = pt.tensor3("v", dtype="float64")
        z = pt.set_subtensor(x[i1, :i2, i3:, ::i4], v)[i1, :i3, i2:, ::i4]
        f = ptt.function([x, i1, i2, i3, i4, v], z)
        assert _nodes(f, WRITE_OPS)
        x_ = RNG.uniform(size=(3, 4, 5, 6))
        v_ = RNG.uniform(size=(2, 2, 2))
        ref = x_.copy()
        ref[1, :2, 3:, ::4] = v_
        np.testing.assert_array_equal(np.asarray(f(x_, 1, 2, 3, 4, v_)),
                                      ref[1, :3, 2:, ::4])

    def test_fewer_dims(self):
        """v broadcasts into the written region -> read is broadcast(v)."""
        x = pt.dmatrix("x")
        i1 = pt.iscalar("i1")
        i2 = pt.iscalar("i2")
        v = pt.dvector("v")
        z = pt.set_subtensor(x[:i1, :i2], v)[:i1, :i2]
        f = ptt.function([x, i1, i2, v], z)
        x_ = RNG.uniform(size=(3, 4))
        v_ = RNG.uniform(size=(2,))
        ref = x_.copy()
        ref[:2, :2] = v_
        np.testing.assert_array_equal(np.asarray(f(x_, 2, 2, v_)),
                                      ref[:2, :2])

    def test_broadcasted(self):
        x = pt.dmatrix("x")
        i1 = pt.iscalar("i1")
        i2 = pt.iscalar("i2")
        v = pt.tensor("v", shape=(None, 1), dtype="float64")
        z = pt.set_subtensor(x[:i1, :i2], v)[:i1, :i2]
        f = ptt.function([x, i1, i2, v], z)
        x_ = RNG.uniform(size=(3, 4))
        v_ = RNG.uniform(size=(2, 1))
        ref = x_.copy()
        ref[:2, :2] = v_
        np.testing.assert_array_equal(np.asarray(f(x_, 2, 2, v_)),
                                      ref[:2, :2])

    def test_different_dtypes(self):
        """The read returns v cast to x's dtype (ref :804)."""
        x = pt.matrix("x", dtype="int8")
        i = pt.iscalar("i")
        v = pt.dvector("v")
        z = pt.set_subtensor(x[i], v)[i]
        f = ptt.function([x, i, v], z)
        assert not _nodes(f, WRITE_OPS)
        x_ = RNG.integers(12, size=(3, 4)).astype("int8")
        v_ = RNG.uniform(0, 12, size=(4,))
        np.testing.assert_array_equal(np.asarray(f(x_, 1, v_)),
                                      v_.astype("int8"))


class TestLocalSubtensorMerge:
    """Reference TestLocalSubtensorMerge:827 (the subset our generalized
    merge supports: constant bounds, [x[i:j][k]] integer merges, chains)."""

    x_shapes = [(2, 2), (5, 3), (4, 1), (1, 2)]

    def _count_subtensor(self, f):
        return len(_nodes(f, (Subtensor,)))

    def test_const(self):
        """x[idx::][-1] -> one Subtensor (ref :832)."""
        x = pt.dmatrix("x")
        for idx in range(-7, 6):
            f = ptt.function([x], x[idx::][-1])
            assert self._count_subtensor(f) <= 1
            for x_s in self.x_shapes:
                x_val = RNG.uniform(size=x_s)
                if idx < x_s[0]:
                    np.testing.assert_array_equal(np.asarray(f(x_val)),
                                                  x_val[idx::][-1])

    def test_const2(self):
        """x[::-1][idx] -> one Subtensor (ref :890)."""
        x = pt.dmatrix("x")
        for idx in range(-4, 4):
            f = ptt.function([x], x[::-1][idx])
            assert self._count_subtensor(f) <= 1
            for x_s in self.x_shapes:
                x_val = RNG.uniform(size=x_s)
                if -x_s[0] <= idx < x_s[0]:
                    np.testing.assert_array_equal(np.asarray(f(x_val)),
                                                  x_val[::-1][idx])

    def test_const4(self):
        """x[c1:][:c2] merges when c1 >= 0 or c2 < 0 (ref :983)."""
        x = pt.dmatrix("x")
        for idx1 in range(-7, 7):
            for idx2 in range(-7, 7):
                f = ptt.function([x], x[idx1:][:idx2])
                expected = 1 if (idx1 >= 0 or idx2 < 0) else 2
                assert self._count_subtensor(f) <= expected
                for x_s in self.x_shapes:
                    x_val = RNG.uniform(size=x_s)
                    np.testing.assert_array_equal(
                        np.asarray(f(x_val)), x_val[idx1:][:idx2])

    def test_const5(self):
        """x[7:1:-1][0] (reported by Razvan in the reference :1087)."""
        data = np.arange(8.0)
        x = pt.dvector("x")
        t = ptt.shared(np.int64(0))
        f = ptt.function([x], x[7:1:-1][t])
        assert np.asarray(f(data)) == data[7:1:-1][0]

    def test_const6(self):
        """Multi-dim chains collapse to one Subtensor (ref :1099)."""
        data = RNG.uniform(size=(8, 8, 8))
        x = pt.tensor3("x", dtype="float64")
        for expr_fn, ref_fn in [
            (lambda x: x[3:6, 2:6, 1:7][1], lambda d: d[3:6, 2:6, 1:7][1]),
            (lambda x: x[2, 3][1], lambda d: d[2, 3][1]),
            (lambda x: x[3:6, 2, 1:7][1], lambda d: d[3:6, 2, 1:7][1]),
        ]:
            f = ptt.function([x], expr_fn(x))
            assert self._count_subtensor(f) <= 1
            np.testing.assert_array_equal(np.asarray(f(data)),
                                          ref_fn(data))

    def test_scalar(self):
        """x[y::][-1] with symbolic y -> one Subtensor (ref :861)."""
        x = pt.dmatrix("x")
        y = pt.iscalar("y")
        f = ptt.function([x, y], x[y::][-1])
        assert self._count_subtensor(f) <= 1
        for x_s in self.x_shapes:
            x_val = RNG.uniform(size=x_s)
            for idx in range(-x_s[0], x_s[0]):
                if idx < x_s[0]:
                    np.testing.assert_array_equal(
                        np.asarray(f(x_val, idx)), x_val[idx::][-1])

    def test_endpoint_overflow(self):
        """Merged bounds must clamp like numpy (ref :1364)."""
        x = pt.lvector("x")
        x_val = np.arange(5, dtype="int64")
        f = ptt.function([x], x[:100][-3])
        np.testing.assert_array_equal(np.asarray(f(x_val)),
                                      x_val[:100][-3])
        f = ptt.function([x], x[100::-1][0])
        np.testing.assert_array_equal(np.asarray(f(x_val)),
                                      x_val[100::-1][0])

    def test_partial_merge_alignment(self):
        """Unmerged outer indices must track their output dims (ref
        :1138)."""
        x = pt.dmatrix("x")
        y = pt.iscalar("y")
        z = x[y:, 1:5][1:, :3]
        f = ptt.function([x, y], z)
        x_val = RNG.uniform(size=(6, 7))
        np.testing.assert_array_equal(np.asarray(f(x_val, 2)),
                                      x_val[2:, 1:5][1:, :3])


class TestReadOfWriteSameIndices:
    """Reference TestReadOfWriteSameIndices:1377."""

    def test_set_symbolic_idx(self):
        x = pt.dmatrix("x")
        y = pt.dmatrix("y")
        idx = pt.ivector("idx")
        o = pt.set_subtensor(x[idx], y)[idx]
        f = ptt.function([x, y, idx], o)
        assert not _nodes(f, WRITE_OPS)
        dx = RNG.random((4, 5))
        dy = RNG.random((3, 5))
        dy[-1] = dy[-2]
        didx = np.asarray([1, 3, 3], "int32")
        np.testing.assert_allclose(np.asarray(f(dx, dy, didx)), dy)

    def test_inc_unique_constant_idx(self):
        x = pt.dmatrix("x")
        y = pt.dmatrix("y")
        cidx = pt.constant(np.array([0, 2, 3], dtype="int32"))
        o = pt.inc_subtensor(x[cidx], y)[cidx]
        f = ptt.function([x, y], o)
        assert not _nodes(f, WRITE_OPS)
        dx = RNG.random((4, 5))
        dy = RNG.random((3, 5))
        expected = dx.copy()
        np.add.at(expected, [0, 2, 3], dy)
        np.testing.assert_allclose(np.asarray(f(dx, dy)),
                                   expected[[0, 2, 3]])

    def test_inc_jointly_unique_constant_idx(self):
        from pytensor_tpu.tensor.rewriting.subtensor import \
            local_read_of_write_same_indices

        x = pt.dmatrix("x")
        y = pt.dvector("y")
        rows = pt.constant(np.array([0, 1, 1], dtype="int32"))
        cols = pt.constant(np.array([0, 0, 1], dtype="int32"))
        o = pt.inc_subtensor(x[rows, cols], y)[rows, cols]
        rewritten = rewrite_graph(
            o, include=(),
            custom_rewrite=in2out(local_read_of_write_same_indices))
        assert_equal_computations([rewritten], [x[rows, cols] + y])

    def test_inc_tril_indices_nonzero(self):
        """tril_indices coords come from one Nonzero: distinct by
        construction (ref :1446)."""
        from pytensor_tpu.tensor.rewriting.subtensor import \
            local_read_of_write_same_indices

        n = pt.iscalar("n")
        x = pt.dmatrix("x")
        y = pt.dvector("y")
        rows, cols = pt.tril_indices(n)
        o = pt.inc_subtensor(x[rows, cols], y)[rows, cols]
        rewritten = rewrite_graph(
            o, include=(),
            custom_rewrite=in2out(local_read_of_write_same_indices))
        assert_equal_computations([rewritten], [x[rows, cols] + y])

    def test_inc_symbolic_bool_mask(self):
        from pytensor_tpu.tensor.rewriting.subtensor import \
            local_read_of_write_same_indices

        x = pt.dvector("x")
        v = pt.dvector("v")
        mask = pt.vector("mask", dtype="bool")
        o = pt.inc_subtensor(x[mask], v)[mask]
        rewritten = rewrite_graph(
            o, include=(),
            custom_rewrite=in2out(local_read_of_write_same_indices))
        assert_equal_computations([rewritten], [x[mask] + v])

    def test_inc_symbolic_arange(self):
        from pytensor_tpu.tensor.rewriting.subtensor import \
            local_read_of_write_same_indices

        k = pt.iscalar("k")
        x = pt.dvector("x")
        v = pt.dvector("v")
        idx = pt.arange(k)
        o = pt.inc_subtensor(x[idx], v)[idx]
        rewritten = rewrite_graph(
            o, include=(),
            custom_rewrite=in2out(local_read_of_write_same_indices))
        assert_equal_computations([rewritten], [x[idx] + v])

        mixed = pt.arange(-2, k)
        o_mixed = pt.inc_subtensor(x[mixed], v)[mixed]
        rewritten_mixed = rewrite_graph(
            o_mixed, include=(),
            custom_rewrite=in2out(local_read_of_write_same_indices))
        assert_equal_computations([rewritten_mixed], [o_mixed])

    @pytest.mark.parametrize("cidx_values, n_rows", [
        ([1, 3, 3], 4),      # duplicate
        ([0, -2], 2),        # mixed sign aliases in a 2-row buffer
    ])
    def test_inc_non_unique_constant_idx(self, cidx_values, n_rows):
        x = pt.dmatrix("x")
        y = pt.dmatrix("y")
        cidx = pt.constant(np.array(cidx_values, dtype="int32"))
        o = pt.inc_subtensor(x[cidx], y)[cidx]
        f = ptt.function([x, y], o)
        assert _nodes(f, WRITE_OPS)
        dx = RNG.random((n_rows, 5))
        dy = RNG.random((len(cidx_values), 5))
        expected = dx.copy()
        np.add.at(expected, cidx_values, dy)
        np.testing.assert_allclose(np.asarray(f(dx, dy)),
                                   expected[cidx_values])

    def test_inc_symbolic_idx_not_rewritten(self):
        x = pt.dmatrix("x")
        y = pt.dmatrix("y")
        idx = pt.ivector("idx")
        o = pt.inc_subtensor(x[idx], y)[idx]
        f = ptt.function([x, y, idx], o)
        assert _nodes(f, WRITE_OPS)
        dx = RNG.random((4, 5))
        dy = RNG.random((3, 5))
        didx = np.array([0, 2, 3], dtype="int32")
        expected = dx.copy()
        np.add.at(expected, didx, dy)
        np.testing.assert_allclose(np.asarray(f(dx, dy, didx)),
                                   expected[didx])

    def test_inc_asserted_unique_idx_rewritten(self):
        """assume(idx, 'unique_indices') unlocks the inc collapse (ref
        :1552)."""
        x = pt.dmatrix("x")
        y = pt.dmatrix("y")
        idx = pt.ivector("idx")
        idx_unique = assume(idx, "unique_indices")
        o = x[idx_unique].inc(y)[idx_unique]
        f = ptt.function([x, y, idx], o)
        assert not _nodes(f, WRITE_OPS)
        dx = RNG.random((4, 5))
        dy = RNG.random((3, 5))
        didx = np.array([0, 2, 3], dtype="int32")
        expected = dx.copy()
        np.add.at(expected, didx, dy)
        np.testing.assert_allclose(np.asarray(f(dx, dy, didx)),
                                   expected[didx])

    def test_set_multi_axis_symbolic(self):
        x = pt.dmatrix("x")
        v = pt.dvector("v")
        idx_a = pt.ivector("idx_a")
        idx_b = pt.ivector("idx_b")
        out = pt.set_subtensor(x[idx_a, idx_b], v)[idx_a, idx_b]
        rewritten = _opt(out)
        assert_equal_computations([rewritten], [v])

    def test_inc_basic_slice(self):
        x = pt.dmatrix("x")
        v = pt.dmatrix("v")
        stop = pt.iscalar("stop")
        out = pt.inc_subtensor(x[:stop], v)[:stop]
        rewritten = _opt(out)
        assert_equal_computations([rewritten], [x[:stop] + v])


class TestReadOfWriteConstantIndices:
    """Reference TestReadOfWriteConstantIndices:1674."""

    def test_inc_multi_axis_unique_const(self):
        x = pt.dmatrix("x")
        v = pt.dvector("v")
        cidx_a = pt.constant(np.array([0, 2, 3], dtype="int32"))
        cidx_b = pt.constant(np.array([1, 2, 4], dtype="int32"))
        out = pt.inc_subtensor(x[cidx_a, cidx_b], v)[cidx_a, cidx_b]
        f = ptt.function([x, v], out)
        assert not _nodes(f, WRITE_OPS)
        dx = RNG.random((4, 5))
        dv = RNG.random((3,))
        expected = dx.copy()
        expected[[0, 2, 3], [1, 2, 4]] += dv
        np.testing.assert_allclose(np.asarray(f(dx, dv)),
                                   expected[[0, 2, 3], [1, 2, 4]])

    def test_slice_read_of_write(self):
        """Constant-index write then constant-slice read (ref :1638)."""
        buf = pt.tensor("buf", shape=(5,), dtype="float64")
        val = pt.tensor("val", shape=(3,), dtype="float64")

        # full overlap: write [0,1,2], read [:3] -> val
        write_idx = pt.constant(np.array([0, 1, 2], dtype="int64"))
        out = buf[write_idx].set(val)[:3]
        f = ptt.function([buf, val], out)
        assert not _nodes(f, WRITE_OPS)
        dbuf = np.arange(5.0)
        dval = np.array([10.0, 20.0, 30.0])
        np.testing.assert_allclose(np.asarray(f(dbuf, dval)), dval)

        # no overlap: write [3,4], read [:2] -> buf[:2]
        val2 = pt.tensor("val2", shape=(2,), dtype="float64")
        write_idx = pt.constant(np.array([3, 4], dtype="int64"))
        out = buf[write_idx].set(val2)[:2]
        f = ptt.function([buf, val2], out)
        assert not _nodes(f, WRITE_OPS)
        np.testing.assert_allclose(
            np.asarray(f(dbuf, np.array([1.0, 2.0]))), dbuf[:2])

    def test_partial_coverage_set(self):
        v = pt.dvector("v")
        write_a = pt.constant(np.array([0, 1, 2], dtype="int64"))
        write_b = pt.constant(np.array([0, 1, 2], dtype="int64"))
        read_a = pt.constant(np.array([0, 1, 2], dtype="int64"))
        read_b = pt.constant(np.array([0, 2, 2], dtype="int64"))
        dv = np.array([10.0, 20.0, 30.0])

        out_zeros = pt.set_subtensor(
            pt.zeros((4, 4))[write_a, write_b], v)[read_a, read_b]
        f_zeros = ptt.function([v], out_zeros)
        np.testing.assert_allclose(np.asarray(f_zeros(dv)),
                                   [10.0, 0.0, 30.0])

        x = pt.dmatrix("x")
        out_x = pt.set_subtensor(x[write_a, write_b], v)[read_a, read_b]
        f_x = ptt.function([x, v], out_x)
        dx = RNG.random((4, 4))
        np.testing.assert_allclose(np.asarray(f_x(dx, dv)),
                                   [10.0, dx[1, 2], 30.0])

    def test_partial_coverage_inc(self):
        x = pt.dmatrix("x")
        v = pt.dvector("v")
        write_a = pt.constant(np.array([0, 1, 2], dtype="int64"))
        write_b = pt.constant(np.array([0, 1, 2], dtype="int64"))
        read_a = pt.constant(np.array([0, 1, 2], dtype="int64"))
        read_b = pt.constant(np.array([0, 2, 2], dtype="int64"))
        out = pt.inc_subtensor(x[write_a, write_b], v)[read_a, read_b]
        f = ptt.function([x, v], out)
        dx = RNG.random((4, 4))
        dv = np.array([10.0, 20.0, 30.0])
        expected = dx[[0, 1, 2], [0, 2, 2]].copy()
        expected[0] += dv[0]
        expected[2] += dv[2]
        np.testing.assert_allclose(np.asarray(f(dx, dv)), expected)

    @pytest.mark.parametrize("write_bool", [False, True])
    @pytest.mark.parametrize("read_bool", [False, True])
    def test_bool_and_int_indices(self, write_bool, read_bool):
        """Bool and int advanced indices interchange at the rewrite
        boundary (ref :1816)."""
        write_pos = np.array([0, 1, 3])
        read_pos = np.array([2, 4])
        write_idx = np.zeros(5, dtype=bool) if write_bool else write_pos
        if write_bool:
            write_idx[write_pos] = True
        read_idx = np.zeros(5, dtype=bool) if read_bool else read_pos
        if read_bool:
            read_idx[read_pos] = True

        x = pt.dvector("x")
        v = pt.dvector("v")
        out = pt.set_subtensor(
            x[pt.constant(write_idx)], v)[pt.constant(read_idx)]
        f = ptt.function([x, v], out)
        dx = np.arange(5.0)
        dv = np.array([10.0, 20.0, 30.0])
        np.testing.assert_allclose(np.asarray(f(dx, dv)), dx[read_pos])


class TestWriteOfWriteSameIndices:
    """Reference TestWriteOfWriteSameIndices:1842."""

    def test_set_of_set_basic_slice(self):
        x, a, b = pt.dmatrix("x"), pt.dmatrix("a"), pt.dmatrix("b")
        stop = pt.iscalar("stop")
        out = pt.set_subtensor(pt.set_subtensor(x[:stop], a)[:stop], b)
        rewritten = _opt(out)
        assert_equal_computations([rewritten],
                                  [pt.set_subtensor(x[:stop], b)])

    def test_inc_of_inc_basic_slice(self):
        x, a, b = pt.dmatrix("x"), pt.dmatrix("a"), pt.dmatrix("b")
        stop = pt.iscalar("stop")
        out = pt.inc_subtensor(pt.inc_subtensor(x[:stop], a)[:stop], b)
        rewritten = _opt(out)
        assert_equal_computations([rewritten],
                                  [pt.inc_subtensor(x[:stop], a + b)])

    def test_inc_of_set_basic_slice(self):
        x, a, b = pt.dmatrix("x"), pt.dmatrix("a"), pt.dmatrix("b")
        stop = pt.iscalar("stop")
        out = pt.inc_subtensor(pt.set_subtensor(x[:stop], a)[:stop], b)
        rewritten = _opt(out)
        assert_equal_computations([rewritten],
                                  [pt.set_subtensor(x[:stop], a + b)])

    def test_inc_of_set_advanced_jointly_unique(self):
        """tril_indices coords are jointly unique -> the two writes fold
        (ref :1889)."""
        from pytensor_tpu.tensor.rewriting.subtensor import \
            local_write_of_write_same_indices

        n = pt.iscalar("n")
        rows, cols = pt.tril_indices(n)
        x = pt.dmatrix("x")
        a = pt.dvector("a")
        b = pt.dvector("b")
        out = pt.inc_subtensor(
            pt.set_subtensor(x[rows, cols], a)[rows, cols], b)
        rewritten = rewrite_graph(
            out, include=(),
            custom_rewrite=in2out(local_write_of_write_same_indices))
        assert_equal_computations(
            [rewritten], [pt.set_subtensor(x[rows, cols], a + b)])

    def test_inc_of_set_advanced_with_slice_rewritten(self):
        """Leading symbolic slice bounds must not block the uniqueness
        check (ref :1926)."""
        x = pt.tensor3("x", dtype="float64")
        a = pt.dmatrix("a")
        b = pt.dmatrix("b")
        lo, hi = pt.iscalar("lo"), pt.iscalar("hi")
        idx = pt.constant(np.array([0, 2], dtype="int32"))
        out = pt.inc_subtensor(
            pt.set_subtensor(x[lo:hi, idx], a)[lo:hi, idx], b)
        rewritten = _opt(out)
        assert_equal_computations(
            [rewritten], [pt.set_subtensor(x[lo:hi, idx], a + b)])

    def test_inc_of_set_advanced_non_unique_not_rewritten(self):
        x = pt.dmatrix("x")
        a = pt.dmatrix("a")
        b = pt.dmatrix("b")
        cidx = pt.constant(np.array([1, 3, 3], dtype="int32"))
        out = pt.inc_subtensor(pt.set_subtensor(x[cidx], a)[cidx], b)
        f = ptt.function([x, a, b], out)
        assert len(_nodes(f, WRITE_OPS)) == 2
        dx = RNG.random((4, 5))
        da = RNG.random((3, 5))
        db = RNG.random((3, 5))
        expected = dx.copy()
        expected[[1, 3, 3]] = da  # numpy set is last-wins like ours
        np.add.at(expected, [1, 3, 3], db)
        np.testing.assert_allclose(np.asarray(f(dx, da, db)), expected)


class TestSubtensorAllocRewrites:
    """Zero-increment and constant-fill writes vanish (ref :1959)."""

    def test_setsubtensor_zeros_into_zeros(self):
        x = pt.dmatrix("x")
        y = pt.dmatrix("y")
        z = pt.set_subtensor(pt.zeros_like(x)[:4], pt.zeros_like(y))
        f = ptt.function([x, y], z)
        assert not _nodes(f, WRITE_OPS)

    def test_incsubtensor_zero_increment(self):
        x = pt.dmatrix("x")
        y = pt.dmatrix("y")
        z = pt.inc_subtensor(x[:4], pt.zeros_like(y))
        f = ptt.function([x, y], z)
        assert not _nodes(f, WRITE_OPS)

    def test_incsubtensor_x_zeros_becomes_set(self):
        """inc into a zeros base becomes a set (ref :2038)."""
        x = pt.constant(np.zeros((4, 4)))
        y = pt.dmatrix("y")
        z = pt.inc_subtensor(x[:3], y)
        f = ptt.function([y], z)
        incs = _nodes(f, WRITE_OPS)
        assert len(incs) == 1 and incs[0].op.set_instead_of_inc
        test_y = RNG.random((3, 4))
        expected = np.zeros((4, 4))
        expected[:3] += test_y
        np.testing.assert_allclose(np.asarray(f(test_y)), expected)

        # non-zero base keeps the inc
        not_all_zeros = np.zeros((4, 4))
        not_all_zeros[1, 0] = 0.001
        x2 = pt.constant(not_all_zeros)
        z2 = pt.inc_subtensor(x2[:3], y)
        f2 = ptt.function([y], z2)
        incs2 = _nodes(f2, WRITE_OPS)
        assert len(incs2) == 1 and not incs2[0].op.set_instead_of_inc
        expected2 = not_all_zeros.copy()
        expected2[:3] += test_y
        np.testing.assert_allclose(np.asarray(f2(test_y)), expected2)

    def test_advanced_zero_increment(self):
        x = pt.dmatrix("x")
        y = pt.dmatrix("y")
        z = pt.inc_subtensor(x[[0, 1, 2, 3]], pt.zeros_like(y))
        f = ptt.function([x, y], z)
        assert not _nodes(f, WRITE_OPS)

    def test_advanced_multiaxis_zero_increment(self):
        x = pt.dmatrix("x")
        y = pt.dmatrix("y")
        z = pt.inc_subtensor(x[[[0, 0], [1, 1]], [[0, 1], [0, 1]]],
                             pt.zeros_like(y))
        f = ptt.function([x, y], z)
        assert not _nodes(f, WRITE_OPS)

    def test_dot_zeros_folds(self):
        """dot(zeros_like(a), b) -> zeros (ref test_dot_allocs_0:2136)."""
        from pytensor_tpu.tensor.math import Dot

        v1, v2 = pt.dvector("v1"), pt.dvector("v2")
        m1, m2 = pt.dmatrix("m1"), pt.dmatrix("m2")
        for e1, e2, args in [(pt.zeros_like(v1), v2, (v1, v2)),
                             (m1, pt.zeros_like(m2), (m1, m2)),
                             (pt.zeros_like(m1), v2, (m1, v2))]:
            o = pt.dot(e1, e2)
            f = ptt.function(list(args), o)
            assert not any(isinstance(n.op, Dot)
                           for n in f.fgraph.toposort())
            vals = [RNG.random((3, 3)) if a.type.ndim == 2
                    else RNG.random(3) for a in args]
            np.testing.assert_allclose(
                np.asarray(f(*vals)),
                np.dot(np.zeros_like(vals[0]) if e1 is not args[0]
                       else vals[0],
                       np.zeros_like(vals[1]) if e2 is not args[1]
                       else vals[1]))


class TestSetToIncSubtensor:
    """set(x[idx], x[idx] + g) -> inc(x, g, idx) (ref :2214)."""

    def test_basic(self):
        v = pt.matrix("v", dtype="float32")
        s = v[pt.constant(np.array([2, 0, 1]))]
        g = s + 3
        r = pt.set_subtensor(s, g)
        f = ptt.function([v], r)
        writes = _nodes(f, WRITE_OPS)
        assert writes and all(not n.op.set_instead_of_inc for n in writes)
        val = RNG.standard_normal((3, 2)).astype("float32")
        expected = val.copy()
        expected[[2, 0, 1]] += 3
        np.testing.assert_allclose(np.asarray(f(val)), expected,
                                   rtol=1e-6)

    def test_duplicate_indices_not_rewritten(self):
        """Symbolic (possibly duplicated) indices must keep the set (ref
        :2254)."""
        v = pt.dvector("v")
        other = pt.dvector("other")
        idx = pt.ivector("idx")
        out = pt.set_subtensor(v[idx], v[idx] + other)
        f = ptt.function([v, other, idx], out)
        writes = _nodes(f, WRITE_OPS)
        assert all(n.op.set_instead_of_inc for n in writes)
        dv = np.array([10.0, 20.0, 30.0])
        dother = np.array([1.0, 2.0])
        didx = np.array([1, 1], dtype="int32")
        expected = dv.copy()
        expected[didx] = dv[didx] + dother  # last-wins
        np.testing.assert_allclose(np.asarray(f(dv, dother, didx)),
                                   expected)

    def test_indexed_axis(self):
        """The collapsed inc must keep indexing the written axis (ref
        :2293)."""
        x = pt.tensor("x", shape=(3, 3), dtype="float64")
        other = pt.tensor("other", shape=(3, 3), dtype="float64")
        i = pt.constant(np.array([2, 0, 1]))
        out = x[:, i].set(x[:, i] + other)
        f = ptt.function([x, other], out)
        dx = np.zeros((3, 3))
        dother = np.arange(9.0).reshape(3, 3)
        expected = dx.copy()
        expected[:, [2, 0, 1]] += dother
        np.testing.assert_allclose(np.asarray(f(dx, dother)), expected)

    @pytest.mark.parametrize("rows, cols, collapses", [
        ([0, 1], [2, 2], True),
        ([1, 1], [2, 2], False),
    ])
    def test_multiple_indices(self, rows, cols, collapses):
        """Joint uniqueness governs the collapse (ref :2316)."""
        x = pt.tensor("x", shape=(3, 3), dtype="float64")
        other = pt.tensor("other", shape=(2,), dtype="float64")
        rows_c = pt.constant(np.array(rows))
        cols_c = pt.constant(np.array(cols))
        out = x[rows_c, cols_c].set(x[rows_c, cols_c] + other)
        f = ptt.function([x, other], out)
        writes = _nodes(f, WRITE_OPS)
        if collapses:
            assert all(not n.op.set_instead_of_inc for n in writes)
        else:
            assert any(n.op.set_instead_of_inc for n in writes)
        dx = np.arange(9.0).reshape(3, 3)
        dother = np.array([100.0, 200.0])
        expected = dx.copy()
        expected[rows, cols] = dx[rows, cols] + dother
        np.testing.assert_allclose(np.asarray(f(dx, dother)), expected)


def test_local_adv_idx_to_slice_boolean_mask():
    """A bool mask must not be fed to the arange reasoning (ref :2334)."""
    x = pt.tensor("x", shape=(5, 2), dtype="float64")
    mask = np.zeros((5, 2), dtype=bool)
    mask[2, 0] = True
    mask[3, 1] = True
    out = x[pt.constant(mask)]
    f = _oracle([x], out)
    dv = np.arange(10.0).reshape(5, 2)
    np.testing.assert_allclose(np.asarray(f(dv)), dv[mask])


class TestUselessSlice:
    """Reference TestUselessSlice:2838 — slice-default canonicalization."""

    def test_positive_step(self):
        x = pt.tensor("x", shape=(3, 5, None, 9), dtype="float64")
        test_x = RNG.standard_normal((3, 5, 8, 9))
        y = x[0:3:1, 1:5:2, 0:7:1, 0:9:1]
        rewritten = _opt(y, include=("canonicalize",))
        expected = x[None:None:None, 1:None:2, None:7:None]
        assert_equal_computations([rewritten], [expected])
        f = _oracle([x], y)
        np.testing.assert_allclose(np.asarray(f(test_x)),
                                   test_x[0:3:1, 1:5:2, 0:7:1, 0:9:1])

    def test_negative_step(self):
        """Negative-step defaults are start=-1, stop=-len-1 (ref
        :2861)."""
        x = pt.tensor("x", shape=(3, 5, None, 9), dtype="float64")
        test_x = RNG.standard_normal((3, 5, 8, 9))
        y = x[-1:-4:-1, 0:5:-2, -1:-9:-1, 0:9:None]
        rewritten = _opt(y, include=("canonicalize",))
        expected = x[None:None:-1, 0:5:-2, None:-9:-1]
        assert_equal_computations([rewritten], [expected])
        f = _oracle([x], y)
        np.testing.assert_allclose(np.asarray(f(test_x)),
                                   test_x[-1:-4:-1, 0:5:-2, -1:-9:-1,
                                          0:9:None])

    def test_unknown_step(self):
        """Symbolic step blocks start/stop canonicalization; the trailing
        full slice still drops (ref :2882)."""
        step = pt.iscalar("step")
        x = pt.tensor("x", shape=(3, 5, None), dtype="float64")
        test_x = RNG.standard_normal((3, 5, 7))
        y = x[0:3:step, -1:-6:-step, ::]
        rewritten = _opt(y, include=("canonicalize",))
        expected = x[0:3:step, -1:-6:-step]
        assert_equal_computations([rewritten], [expected])
        f = _oracle([x, step], y)
        np.testing.assert_allclose(np.asarray(f(test_x, 1)),
                                   test_x[0:3:1, -1:-6:-1, ::])
        np.testing.assert_allclose(np.asarray(f(test_x, -2)),
                                   test_x[0:3:-2, -1:-6:2, ::])


class TestArangeRewrites:
    """Reference TestArangeRewrites:2911."""

    @pytest.mark.parametrize("offset", [0, 2])
    def test_constant_arange_step_one(self, offset):
        x = pt.tensor("x", shape=(10,), dtype="float64")
        out = x[pt.constant(np.arange(4, dtype=np.int64) + offset)]
        rewritten = _opt(out)
        expected = x[offset:offset + 4] if offset else x[:4]
        assert_equal_computations([rewritten], [_opt(expected)])

    def test_constant_arange_positive_step(self):
        x = pt.tensor("x", shape=(10,), dtype="float64")
        idx = pt.constant(np.array([2, 4, 6, 8], dtype=np.int64))
        rewritten = _opt(x[idx])
        assert rewritten.owner is not None
        assert isinstance(rewritten.owner.op, Subtensor)
        f = _oracle([x], rewritten)
        dv = np.arange(10.0)
        np.testing.assert_array_equal(np.asarray(f(dv)), dv[[2, 4, 6, 8]])

    def test_constant_arange_negative_step(self):
        """[5,4,3,2,1,0] -> x[5::-1]; a would-be negative stop must become
        None (ref :2938)."""
        x = pt.tensor("x", shape=(10,), dtype="float64")
        idx = pt.constant(np.array([5, 4, 3, 2, 1, 0], dtype=np.int64))
        rewritten = _opt(x[idx])
        assert isinstance(rewritten.owner.op, Subtensor)
        f = _oracle([x], rewritten)
        dv = np.arange(10.0)
        np.testing.assert_array_equal(np.asarray(f(dv)), dv[5::-1])

    def test_uniformly_negative_constant_does_not_rewrite(self):
        """numpy wraps negative advanced indices; a forward slice can't
        (ref :2960)."""
        x = pt.tensor("x", shape=(10,), dtype="float64")
        idx = pt.constant(np.array([-2, -1, 0], dtype=np.int64))
        out = x[idx]
        rewritten = _opt(out)
        assert isinstance(rewritten.owner.op,
                          (AdvancedSubtensor, AdvancedSubtensor1))

    def test_paired_constant_arange_zero_offset(self):
        """x[[0,1,2],[0,1,2]] on (3,3) -> diagonal (ref :3006)."""
        x = pt.tensor("x", shape=(3, 3), dtype="float64")
        idx = pt.constant(np.arange(3, dtype=np.int64))
        out = x[idx, idx]
        f = ptt.function([x], out)
        assert not _nodes(f, (AdvancedSubtensor, AdvancedSubtensor1))
        dv = np.arange(9.0).reshape(3, 3)
        np.testing.assert_array_equal(np.asarray(f(dv)), np.diagonal(dv))

    def test_paired_arange_partial_coverage_does_not_rewrite(self):
        """x[arange(2), arange(2)] on (5,5) is a sub-diagonal gather (ref
        :2998)."""
        x = pt.tensor("x", shape=(5, 5), dtype="float64")
        d = pt.constant(np.int64(2))
        out = x[pt.arange(d), pt.arange(d)]
        f = _oracle([x], out)
        dv = np.arange(25.0).reshape(5, 5)
        np.testing.assert_array_equal(np.asarray(f(dv)),
                                      dv[np.arange(2), np.arange(2)])


def test_local_convert_negative_indices():
    """Reference test_local_convert_negative_indices:3089."""
    x = pt.tensor("x", shape=(None, 3, 1), dtype="float64")

    # unknown dim length: no rewrite
    rewritten = rewrite_graph(x[-2], include=("canonicalize",))
    assert_equal_computations([rewritten], [x[-2]])

    # known dim: -2 -> 1
    rewritten = rewrite_graph(x[:, -2], include=("canonicalize",))
    assert_equal_computations([rewritten], [x[:, 1]])


def test_cholesky_unconstrain_grad():
    """Integration: gradient of a Cholesky-based log-density (ref
    :3019). The packed-vector scatter + diag-exp + logdet pattern must
    produce correct grads through the subtensor rewrite pipeline."""
    n = 3
    packed = pt.dvector("packed")
    tril_r, tril_c = np.tril_indices(n)
    L = pt.zeros((n, n))
    L = pt.set_subtensor(L[tril_r, tril_c], packed)
    diag_indices = np.diag_indices(n)
    log_diag = L[diag_indices]
    L = L[diag_indices].set(pt.exp(log_diag))
    Sigma = L @ L.T
    loss = pt.sum(pt.log(pt.diagonal(L))) + pt.sum(Sigma)
    grad = ptt.grad(loss, packed)

    x = np.array([1.0, 0.5, 2.0, 0.3, 0.1, 1.5])
    expected_loss = 93.04980520058317
    expected_grad = np.array([20.12736312, 7.03656366, 111.67411129,
                              7.03656366, 14.9781122, 41.17107385])
    f = ptt.function([packed], [loss, grad])
    loss_out, grad_out = f(x)
    np.testing.assert_allclose(np.asarray(loss_out), expected_loss)
    np.testing.assert_allclose(np.asarray(grad_out), expected_grad,
                               rtol=1e-7)


class TestBlockwiseIncSubtensor:
    """Batched set/inc lowers without Blockwise overhead and matches the
    unvectorized oracle (ref TestBlockwiseIncSubtensor:2606; our lift is
    SURVEY-§7-endorsed: Blockwise lowers through vmap, these assert the
    values)."""

    @pytest.mark.parametrize("set_instead_of_inc", [True, False],
                             ids=["set", "inc"])
    @pytest.mark.parametrize("basic_idx", [True, False],
                             ids=["basic_idx", "adv_idx"])
    def test_batched_x(self, basic_idx, set_instead_of_inc):
        from pytensor_tpu.graph.replace import vectorize_graph

        core_x = pt.tensor("x", shape=(6, 6), dtype="float64")
        core_y = pt.tensor("y", shape=(3,), dtype="float64")
        core_idxs = (-1, slice(None, 3)) if basic_idx else (-1, [0, 2, 4])
        if set_instead_of_inc:
            core_graph = pt.set_subtensor(core_x[core_idxs], core_y)
        else:
            core_graph = pt.inc_subtensor(core_x[core_idxs], core_y)

        x = pt.tensor("xb", shape=(5, 2, 6, 6), dtype="float64")
        y = pt.tensor("yb", shape=(3,), dtype="float64")
        out = vectorize_graph(core_graph, replace={core_x: x, core_y: y})
        test_x = np.ones((5, 2, 6, 6))
        test_y = RNG.integers(1, 10, size=(3,)).astype("float64")
        compare_xla_and_py([x, y], out, [test_x, test_y])

    def test_batched_y(self):
        from pytensor_tpu.graph.replace import vectorize_graph

        core_x = pt.tensor("x", shape=(6, 6), dtype="float64")
        core_y = pt.tensor("y", shape=(3,), dtype="float64")
        core_graph = pt.set_subtensor(core_x[-1, :3], core_y)
        x = pt.tensor("xb", shape=(6, 6), dtype="float64")
        y = pt.tensor("yb", shape=(2, 3), dtype="float64")
        out = vectorize_graph(core_graph, replace={core_x: x, core_y: y})
        test_x = np.ones((6, 6))
        test_y = RNG.integers(1, 10, size=(2, 3)).astype("float64")
        compare_xla_and_py([x, y], out, [test_x, test_y])
