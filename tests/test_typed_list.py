"""Typed-list ops on both backends.

Mirrors /root/reference/tests/typed_list/test_basic.py scenarios: op
semantics through the XLA path (static pytree structure) and the PY
oracle (dynamic structure allowed), plus the TypedListVariable sugar.
"""

import numpy as np
import pytest

import pytensor_tpu as ptt
import pytensor_tpu.tensor as pt
import pytensor_tpu.typed_list as tl
from pytensor_tpu.compile.mode import get_mode


def _modes():
    return [None, get_mode("PY")]


@pytest.mark.parametrize("mode", _modes(), ids=["xla", "py"])
class TestTypedListOps:
    def _vecs(self):
        a, b = pt.vector("a"), pt.vector("b")
        av = np.array([1.0, 2.0, 3.0], dtype="float32")
        bv = np.array([4.0, 5.0, 6.0], dtype="float32")
        return a, b, av, bv

    def test_make_getitem(self, mode):
        a, b, av, bv = self._vecs()
        lst = tl.make_list([a, b])
        f = ptt.function([a, b], [tl.getitem(lst, 0), tl.getitem(lst, -1)],
                         mode=mode)
        r0, r1 = f(av, bv)
        np.testing.assert_allclose(np.asarray(r0), av)
        np.testing.assert_allclose(np.asarray(r1), bv)

    def test_getitem_traced_index(self, mode):
        a, b, av, bv = self._vecs()
        i = pt.scalar("i", dtype="int64")
        lst = tl.make_list([a, b])
        f = ptt.function([a, b, i], tl.getitem(lst, i), mode=mode)
        np.testing.assert_allclose(np.asarray(f(av, bv, 1)), bv)
        np.testing.assert_allclose(np.asarray(f(av, bv, 0)), av)

    def test_append_extend_insert(self, mode):
        a, b, av, bv = self._vecs()
        lst = tl.make_list([a])
        lst2 = tl.insert(tl.extend(tl.append(lst, b), lst), 0, a + b)
        f = ptt.function([a, b], [tl.length(lst2), tl.getitem(lst2, 0)],
                         mode=mode)
        n, first = f(av, bv)
        assert int(n) == 4
        np.testing.assert_allclose(np.asarray(first), av + bv)

    def test_reverse(self, mode):
        a, b, av, bv = self._vecs()
        lst = tl.reverse(tl.make_list([a, b]))
        f = ptt.function([a, b], tl.getitem(lst, 0), mode=mode)
        np.testing.assert_allclose(np.asarray(f(av, bv)), bv)

    def test_count_index(self, mode):
        a, b, av, bv = self._vecs()
        lst = tl.make_list([a, b, a])
        f = ptt.function([a, b], [tl.count(lst, a), tl.index_(lst, b)],
                         mode=mode)
        c, i = f(av, bv)
        assert int(c) == 2
        assert int(i) == 1


class TestOracleOnlyOps:
    def test_remove_on_oracle(self):
        a, b = pt.vector("a"), pt.vector("b")
        lst = tl.remove(tl.make_list([a, b]), a)
        f = ptt.function([a, b], tl.length(lst), mode=get_mode("PY"))
        assert int(f(np.ones(3, "f4"), np.zeros(3, "f4"))) == 1

    def test_remove_rejected_on_xla(self):
        a, b = pt.vector("a"), pt.vector("b")
        lst = tl.remove(tl.make_list([a, b]), a)
        f = ptt.function([a, b], tl.length(lst))
        with pytest.raises(Exception, match="data-dependent|oracle"):
            f(np.ones(3, "f4"), np.zeros(3, "f4"))


class TestVariableSugar:
    def test_methods_build_ops(self):
        t = tl.TypedListType(pt.vector("p").type)
        v = t("l")
        assert isinstance(v, tl.TypedListVariable)
        q = pt.vector("q")
        assert type(v.append(q).owner.op).__name__ == "Append"
        assert type(v[0].owner.op).__name__ == "GetItem"
        assert type(v.reverse().owner.op).__name__ == "Reverse"
        assert type(v.count(q).owner.op).__name__ == "Count"

    def test_sugar_chain_executes(self):
        a, b = pt.vector("a"), pt.vector("b")
        lst = tl.make_list([a])
        out = lst.append(b).reverse()[0]
        f = ptt.function([a, b], out)
        np.testing.assert_allclose(
            np.asarray(f(np.ones(3, "f4"), 2 * np.ones(3, "f4"))),
            2 * np.ones(3),
        )

    def test_constant_class(self):
        t = tl.TypedListType(pt.vector("p").type)
        c = t.make_constant([np.ones(2, "f4")])
        assert isinstance(c, tl.TypedListConstant)


class TestTypedListInScan:
    def test_list_as_non_sequence(self):
        a, b = pt.vector("a"), pt.vector("b")
        lst = tl.make_list([a, b])

        def step(acc, l):
            return acc + tl.getitem(l, 0) + tl.getitem(l, 1)

        res, _ = ptt.scan(step, outputs_info=[pt.zeros_like(a)],
                          non_sequences=[lst], n_steps=3)
        f = ptt.function([a, b], res[-1])
        av = np.ones(3, "f4")
        bv = 2 * np.ones(3, "f4")
        np.testing.assert_allclose(np.asarray(f(av, bv)), 9 * np.ones(3))
