"""RandomVariable lift rewrites (reference
tests/tensor/random/rewriting/test_basic.py scenarios).

Equivalence standard: the lifted graph must be *structurally identical*
to the hand-lifted construction — compiled with the same rng input it
must sample bitwise-identical values (key replay).  Bitwise equality
with the ORIGINAL unlifted graph is impossible for any counter-based
PRNG (element randomness is keyed on output position), so distributional
checks cover original-vs-lifted.
"""

import numpy as np
import pytest

import pytensor_tpu as ptt
import pytensor_tpu.tensor as pt
import pytensor_tpu.tensor.random as ptr
from pytensor_tpu.graph.rewriting.utils import rewrite_graph
from pytensor_tpu.tensor.random.op import RandomVariable

LIFT = ("random_lift",)


def lift(expr):
    return rewrite_graph(expr, include=LIFT)


def assert_key_replay_equal(inputs, lifted, hand, vals, mode=None):
    """Compile both graphs (built over same-seed rngs) and compare draws."""
    f1 = ptt.function(inputs, lifted, mode=mode)
    f2 = ptt.function(inputs, hand, mode=mode)
    a = np.asarray(f1(*vals))
    b = np.asarray(f2(*vals))
    np.testing.assert_array_equal(a, b)
    return a


def rngs():
    """Two independent shared RNG variables with identical state."""
    return ptr.rng(42), ptr.rng(42)


def rv_op_of(var):
    assert var.owner is not None and isinstance(var.owner.op, RandomVariable), (
        f"expected a lifted RandomVariable, got {var.owner and var.owner.op}")
    return var.owner.op


class TestSizeLift:
    def test_scalar_params(self):
        out = lift(ptr.normal(0.0, 1.0, size=(3, 2)))
        node = out.owner
        assert isinstance(node.op, RandomVariable)
        assert node.inputs[1].type.__class__.__name__ == "NoneTypeT"
        assert out.type.shape == (3, 2)
        f = ptt.function([], out)
        assert np.asarray(f()).shape == (3, 2)

    def test_vector_param_broadcast(self):
        mu = pt.dvector("mu")
        out = lift(ptr.normal(mu, 1.0, size=(4, 3)))
        assert isinstance(out.owner.op, RandomVariable)
        f = ptt.function([mu], out)
        assert np.asarray(f(np.zeros(3))).shape == (4, 3)

    def test_mvnormal_size(self):
        mu = pt.dvector("mu")
        cov = pt.dmatrix("cov")
        out = lift(ptr.multivariate_normal(mu, cov, size=(5,)))
        assert isinstance(out.owner.op, RandomVariable)
        f = ptt.function([mu, cov], out)
        d = np.asarray(f(np.zeros(3), np.eye(3)))
        assert d.shape == (5, 3)

    def test_no_size_untouched(self):
        mu = pt.dvector("mu")
        rv = ptr.normal(mu, 1.0)
        out = lift(rv)
        assert out.owner.op is rv.owner.op
        assert out.owner.inputs[1].type.__class__.__name__ == "NoneTypeT"


class TestDimShuffleLift:
    def test_transpose(self):
        m = pt.dmatrix("m")
        r1, r2 = rngs()
        out = lift(ptr.normal(m, 1.0, rng=r1).T)
        op = rv_op_of(out)
        assert op.name == "normal"
        hand = ptr.normal(m.T, 1.0, rng=r2)
        v = np.arange(6.0).reshape(2, 3)
        a = assert_key_replay_equal([m], out, hand, [v])
        assert a.shape == (3, 2)

    def test_augment(self):
        mu = pt.dvector("mu")
        r1, r2 = rngs()
        expr = ptr.normal(mu, 1.0, rng=r1).dimshuffle("x", 0)
        out = lift(expr)
        rv_op_of(out)
        hand = ptr.normal(mu.dimshuffle("x", 0), 1.0, rng=r2)
        a = assert_key_replay_equal([mu], out, hand, [np.zeros(4)])
        assert a.shape == (1, 4)

    def test_degenerate_param_padded(self):
        # sigma is scalar: its shuffled order must pad with 'x'
        mu = pt.dmatrix("mu")
        sig = pt.dscalar("sig")
        r1, r2 = rngs()
        out = lift(ptr.normal(mu, sig, rng=r1).T)
        rv_op_of(out)
        hand = ptr.normal(mu.T, sig, rng=r2)
        assert_key_replay_equal(
            [mu, sig], out, hand, [np.zeros((2, 3)), np.float64(1.0)])

    def test_mvnormal_batch_transpose(self):
        mu = pt.tensor("mu", dtype="float64", shape=(2, 3, 4))
        cov = pt.dmatrix("cov")
        r1, r2 = rngs()
        expr = ptr.multivariate_normal(mu, cov, rng=r1).dimshuffle(1, 0, 2)
        out = lift(expr)
        rv_op_of(out)
        hand = ptr.multivariate_normal(mu.dimshuffle(1, 0, 2), cov, rng=r2)
        a = assert_key_replay_equal(
            [mu, cov], out, hand, [np.zeros((2, 3, 4)), np.eye(4)])
        assert a.shape == (3, 2, 4)

    def test_support_dim_shuffle_not_lifted(self):
        # transposing INTO the support dim must not lift
        mu = pt.dmatrix("mu")  # batch (2,), supp (4,) -> rv (2, 4)
        cov = pt.dmatrix("cov")
        expr = ptr.multivariate_normal(mu, cov).T
        out = lift(expr)
        assert not isinstance(out.owner.op, RandomVariable)

    def test_size_updated(self):
        out = lift(ptr.normal(0.0, 1.0, size=(2, 3)).T)
        op = rv_op_of(out)
        assert op.name == "normal"
        assert out.type.shape == (3, 2)


class TestSubtensorLift:
    def test_int_index(self):
        mu = pt.dvector("mu")
        r1, r2 = rngs()
        out = lift(ptr.normal(mu, 1.0, rng=r1)[2])
        rv_op_of(out)
        hand = ptr.normal(mu[2], 1.0, rng=r2)
        assert_key_replay_equal([mu], out, hand, [np.arange(5.0)])

    def test_slice(self):
        mu = pt.dvector("mu")
        r1, r2 = rngs()
        out = lift(ptr.normal(mu, 1.0, rng=r1)[1:4])
        rv_op_of(out)
        hand = ptr.normal(mu[1:4], 1.0, rng=r2)
        a = assert_key_replay_equal([mu], out, hand, [np.arange(6.0)])
        assert a.shape == (3,)

    def test_dynamic_scalar_index(self):
        mu = pt.dvector("mu")
        i = pt.lscalar("i")
        r1, r2 = rngs()
        out = lift(ptr.normal(mu, 1.0, rng=r1)[i])
        rv_op_of(out)
        hand = ptr.normal(mu[i], 1.0, rng=r2)
        assert_key_replay_equal([mu, i], out, hand, [np.arange(5.0), 3])

    def test_degenerate_param_dim(self):
        # mu broadcasts along the batch dim sigma provides: indexing must
        # hit sigma but leave mu's size-1 dim via a 0-index
        mu = pt.tensor("mu", dtype="float64", shape=(1,))
        sig = pt.dvector("sig")
        r1, r2 = rngs()
        out = lift(ptr.normal(mu, sig, rng=r1)[2])
        rv_op_of(out)
        hand = ptr.normal(mu[0], sig[2], rng=r2)
        assert_key_replay_equal(
            [mu, sig], out, hand, [np.zeros(1), np.arange(1.0, 6.0)])

    def test_mvnormal_trailing_full_slice_dropped(self):
        mu = pt.dmatrix("mu")  # (2, 4): batch (2,), supp (4,)
        cov = pt.dmatrix("cov")
        r1, r2 = rngs()
        out = lift(ptr.multivariate_normal(mu, cov, rng=r1)[0, :])
        rv_op_of(out)
        hand = ptr.multivariate_normal(mu[0], cov, rng=r2)
        a = assert_key_replay_equal(
            [mu, cov], out, hand, [np.zeros((2, 4)), np.eye(4)])
        assert a.shape == (4,)

    def test_support_dim_index_not_lifted(self):
        mu = pt.dmatrix("mu")
        cov = pt.dmatrix("cov")
        out = lift(ptr.multivariate_normal(mu, cov)[0, 1])
        assert not isinstance(out.owner.op, RandomVariable)

    def test_integer_vector_index_not_lifted(self):
        # duplicate indices must duplicate DRAWS, not re-sample
        mu = pt.dvector("mu")
        idx = pt.lvector("idx")
        out = lift(ptr.normal(mu, 1.0)[idx])
        assert not isinstance(out.owner.op, RandomVariable)

    def test_size_folded_then_indexed(self):
        mu = pt.dvector("mu")
        out = lift(ptr.normal(mu, 1.0, size=(4, 3))[1])
        rv_op_of(out)
        f = ptt.function([mu], out)
        assert np.asarray(f(np.zeros(3))).shape == (3,)

    def test_rv_used_elsewhere_not_lifted(self):
        mu = pt.dvector("mu")
        rv = ptr.normal(mu, 1.0)
        # rv value consumed by another client: lifting would make the
        # indexed values inconsistent with the summed ones
        res = rewrite_graph([rv[0], rv.sum()], include=LIFT)
        assert not isinstance(res[0].owner.op, RandomVariable)

    def test_shape_client_does_not_block(self):
        mu = pt.dvector("mu")
        rv = ptr.normal(mu, 1.0)
        res = rewrite_graph([rv[0], rv.shape[0]], include=LIFT)
        assert isinstance(res[0].owner.op, RandomVariable)

    def test_bool_mask_lift(self):
        mu = pt.dvector("mu")
        mask = pt.vector("mask", dtype="bool")
        r1, r2 = rngs()
        out = lift(ptr.normal(mu, 1.0, rng=r1)[mask])
        rv_op_of(out)
        hand = ptr.normal(mu[mask], 1.0, rng=r2)
        m = np.array([True, False, True, True])
        # dynamic output shape: XLA cannot express it; drive the oracle
        assert_key_replay_equal(
            [mu, mask], out, hand, [np.arange(4.0), m], mode="FAST_COMPILE")


class TestDistributional:
    """Original vs lifted: same distribution (moments), not same bits."""

    def test_moments_preserved(self):
        mu = pt.dvector("mu")
        rv = ptr.normal(mu, 0.1, size=(20000, 3))
        lifted = lift(rv[:, 1])
        rv_op_of(lifted)
        f = ptt.function([mu], lifted)
        draws = np.asarray(f(np.array([0.0, 5.0, -2.0])))
        assert draws.shape == (20000,)
        assert abs(draws.mean() - 5.0) < 0.01
        assert abs(draws.std() - 0.1) < 0.01
