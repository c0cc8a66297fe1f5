"""Compile-layer contract grids: In/Out semantics, givens chains,
updates interactions, Function.copy/pickling, value defaults, strict /
allow_downcast, profile plumbing.

Reference analog: tests/compile/ (maker, executor, shared, rebuild,
modes) — the function-pipeline behaviors a PyMC-style consumer depends
on.
"""

from __future__ import annotations

import io
import pickle

import numpy as np
import pytest

import pytensor_tpu as ptt
import pytensor_tpu.tensor as pt
from pytensor_tpu.compile.io import In, Out
from pytensor_tpu.compile.sharedvalue import shared

rng = np.random.default_rng(29)


class TestInSemantics:
    def test_in_with_default_value(self):
        x = pt.dscalar("x")
        y = pt.dscalar("y")
        f = ptt.function([x, In(y, value=2.0)], x + y)
        assert float(np.asarray(f(3.0))) == 5.0
        assert float(np.asarray(f(3.0, 10.0))) == 13.0

    def test_in_named_keyword_call(self):
        x = pt.dscalar("x")
        y = pt.dscalar("y")
        f = ptt.function([In(x, name="a"), In(y, name="b", value=1.0)],
                         x - y)
        assert float(np.asarray(f(5.0, b=2.0))) == 3.0

    def test_strict_input_rejects_downcast(self):
        x = pt.tensor("x", dtype="float32", shape=(2,))
        f = ptt.function([In(x, strict=True)], x * 2)
        with pytest.raises((TypeError, ValueError)):
            f(np.zeros(2, dtype="float64"))

    def test_allow_downcast_accepts(self):
        x = pt.tensor("x", dtype="float32", shape=(2,))
        f = ptt.function([In(x, allow_downcast=True)], x * 2)
        res = np.asarray(f(np.ones(2, dtype="float64")))
        assert res.dtype == np.float32

    def test_in_update(self):
        x = pt.dscalar("x")
        s = shared(np.asarray(1.0), name="s")
        f = ptt.function([x], s, updates=[(s, s + x)])
        f(2.0)
        f(3.0)
        assert float(s.get_value()) == 6.0


class TestGivens:
    def test_givens_replaces_subgraph(self):
        x = pt.dvector("x")
        y = pt.dvector("y")
        expr = pt.sum(x ** 2)
        f = ptt.function([y], expr, givens={x: y * 2})
        v = np.array([1.0, 2.0])
        assert float(np.asarray(f(v))) == float(((v * 2) ** 2).sum())

    def test_givens_with_constant(self):
        x = pt.dscalar("x")
        y = pt.dscalar("y")
        f = ptt.function([y], x + y, givens={x: np.float64(10.0)})
        assert float(np.asarray(f(1.0))) == 11.0

    def test_givens_shared_substitution(self):
        s = shared(np.asarray(3.0), name="s")
        t = shared(np.asarray(7.0), name="t")
        x = pt.dscalar("x")
        f = ptt.function([x], x * s, givens={s: t})
        assert float(np.asarray(f(2.0))) == 14.0


class TestUpdates:
    def test_update_ordering_consistent(self):
        # both updates read the PRE-update values (simultaneous semantics)
        a = shared(np.asarray(1.0), name="a")
        b = shared(np.asarray(10.0), name="b")
        f = ptt.function([], [], updates=[(a, a + b), (b, b + a)])
        f()
        assert float(a.get_value()) == 11.0
        assert float(b.get_value()) == 11.0

    def test_update_with_explicit_input_dependency(self):
        w = shared(np.zeros(3), name="w")
        g = pt.dvector("g")
        f = ptt.function([g], [], updates=[(w, w - 0.5 * g)])
        f(np.ones(3))
        np.testing.assert_allclose(w.get_value(), -0.5 * np.ones(3))

    def test_updates_dict_form(self):
        c = shared(np.asarray(0), name="c")
        f = ptt.function([], c, updates={c: c + 1})
        f(); f(); f()
        assert int(c.get_value()) == 3

    def test_no_update_leak_between_functions(self):
        s = shared(np.asarray(5.0), name="s")
        f1 = ptt.function([], s, updates=[(s, s * 2)])
        f2 = ptt.function([], s)
        f1()
        assert float(np.asarray(f2())) == 10.0


class TestFunctionCopy:
    def test_copy_independent_updates(self):
        s = shared(np.asarray(1.0), name="s")
        f = ptt.function([], s, updates=[(s, s + 1)])
        g = f.copy(share_memory=False)
        f(); f()
        # the copy has its OWN container: advancing f must not move g's
        before = float(np.asarray(g()))
        assert before == 1.0

    def test_copy_swap_shared(self):
        s = shared(np.asarray(2.0), name="s")
        t = shared(np.asarray(5.0), name="t")
        x = pt.dscalar("x")
        f = ptt.function([x], x * s)
        g = f.copy(swap={s: t})
        assert float(np.asarray(f(1.0))) == 2.0
        assert float(np.asarray(g(1.0))) == 5.0

    def test_copy_delete_updates(self):
        s = shared(np.asarray(1.0), name="s")
        f = ptt.function([], s, updates=[(s, s + 1)])
        g = f.copy(delete_updates=True)
        g(); g()
        assert float(s.get_value()) == 1.0


class TestPickling:
    def test_function_roundtrip(self):
        x = pt.dvector("x")
        s = shared(np.array([1.0, 2.0]), name="s")
        f = ptt.function([x], pt.sum(x * s))
        blob = pickle.dumps(f)
        f2 = pickle.loads(blob)
        v = np.array([3.0, 4.0])
        assert float(np.asarray(f2(v))) == float(np.asarray(f(v)))

    def test_pickled_function_keeps_shared_value(self):
        s = shared(np.asarray(42.0), name="s")
        f = ptt.function([], s * 2)
        f2 = pickle.loads(pickle.dumps(f))
        assert float(np.asarray(f2())) == 84.0

    def test_zip_dump_load(self):
        from pytensor_tpu.misc.pkl_utils import dump, load

        s = shared(np.arange(4.0), name="s")
        x = pt.dvector("x")
        f = ptt.function([x], pt.sum(x + s))
        buf = io.BytesIO()
        dump(f, buf)
        buf.seek(0)
        f2 = load(buf)
        v = np.ones(4)
        assert float(np.asarray(f2(v))) == float(np.asarray(f(v)))


class TestModesAndErrors:
    def test_on_unused_input_raise_default(self):
        x = pt.dscalar("x")
        y = pt.dscalar("y")
        with pytest.raises(Exception):
            ptt.function([x, y], x * 2)  # y unused -> error by default

    def test_missing_input_error(self):
        x = pt.dscalar("x")
        y = pt.dscalar("y")
        with pytest.raises(Exception):
            ptt.function([x], x + y)  # y not provided

    def test_output_list_vs_single(self):
        x = pt.dscalar("x")
        f1 = ptt.function([x], x * 2)
        f2 = ptt.function([x], [x * 2])
        r1 = f1(3.0)
        r2 = f2(3.0)
        assert not isinstance(r1, (list, tuple))
        assert isinstance(r2, (list, tuple)) and len(r2) == 1

    def test_duplicate_updates_rejected(self):
        s = shared(np.asarray(1.0), name="s")
        with pytest.raises(Exception):
            ptt.function([], [], updates=[(s, s + 1), (s, s + 2)])

    def test_profile_collects(self):
        x = pt.dvector("x")
        f = ptt.function([x], pt.sum(pt.exp(x)), profile=True)
        f(np.ones(4))
        assert f.profile is not None

    def test_out_borrow_accepted(self):
        x = pt.dvector("x")
        f = ptt.function([x], Out(pt.exp(x), borrow=True))
        np.testing.assert_allclose(np.asarray(f(np.zeros(2))), np.ones(2))
