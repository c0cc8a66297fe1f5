"""Typed lists of graph values (reference typed_list/, 827 LoC).

Values are python lists of the element type's values; on the XLA path a
typed list is a pytree (tuple) of arrays, so jit handles it natively as
long as lengths are trace-time static.
"""

from __future__ import annotations

import numpy as np

from pytensor_tpu.graph.basic import Apply, Constant, Variable
from pytensor_tpu.graph.op import Op
from pytensor_tpu.graph.type import Type


class TypedListType(Type):
    __props__ = ("ttype",)

    def __init__(self, ttype):
        self.ttype = ttype

    def filter(self, data, strict=False, allow_downcast=None):
        if not isinstance(data, (list, tuple)):
            raise TypeError("expected a list")
        return [self.ttype.filter(d, strict=strict, allow_downcast=allow_downcast)
                for d in data]

    def values_eq(self, a, b):
        return len(a) == len(b) and all(
            self.ttype.values_eq(x, y) for x, y in zip(a, b)
        )

    def __str__(self):
        return f"TypedList<{self.ttype}>"


class MakeList(Op):
    __props__ = ()

    def make_node(self, *elems):
        if not elems:
            raise ValueError("make_list needs at least one element")
        elems = list(elems)
        t = elems[0].type
        for e in elems:
            if e.type != t:
                raise TypeError("all list elements must have the same type")
        return Apply(self, elems, [TypedListType(t)()])

    def perform(self, node, inputs, output_storage):
        output_storage[0][0] = list(inputs)


make_list_ = MakeList()


def make_list(elems):
    return make_list_(*elems)


class GetItem(Op):
    __props__ = ()

    def make_node(self, x, index):
        from pytensor_tpu.tensor.basic import as_tensor_variable

        index = as_tensor_variable(index)
        return Apply(self, [x, index], [x.type.ttype()])

    def perform(self, node, inputs, output_storage):
        x, i = inputs
        output_storage[0][0] = x[int(i)]


getitem = GetItem()


class Append(Op):
    __props__ = ()

    def make_node(self, x, elem):
        elem = x.type.ttype.filter_variable(elem)
        return Apply(self, [x, elem], [x.type()])

    def perform(self, node, inputs, output_storage):
        x, e = inputs
        output_storage[0][0] = list(x) + [e]


append = Append()


class Extend(Op):
    __props__ = ()

    def make_node(self, x, y):
        if x.type != y.type:
            raise TypeError("extend needs lists of the same type")
        return Apply(self, [x, y], [x.type()])

    def perform(self, node, inputs, output_storage):
        output_storage[0][0] = list(inputs[0]) + list(inputs[1])


extend = Extend()


class Insert(Op):
    __props__ = ()

    def make_node(self, x, index, elem):
        from pytensor_tpu.tensor.basic import as_tensor_variable

        elem = x.type.ttype.filter_variable(elem)
        return Apply(self, [x, as_tensor_variable(index), elem], [x.type()])

    def perform(self, node, inputs, output_storage):
        x, i, e = inputs
        res = list(x)
        res.insert(int(i), e)
        output_storage[0][0] = res


insert = Insert()


class Remove(Op):
    __props__ = ()

    def make_node(self, x, elem):
        elem = x.type.ttype.filter_variable(elem)
        return Apply(self, [x, elem], [x.type()])

    def perform(self, node, inputs, output_storage):
        x, e = inputs
        res = list(x)
        for k, v in enumerate(res):
            if np.array_equal(np.asarray(v), np.asarray(e)):
                del res[k]
                break
        output_storage[0][0] = res


remove = Remove()


class Reverse(Op):
    __props__ = ()

    def make_node(self, x):
        return Apply(self, [x], [x.type()])

    def perform(self, node, inputs, output_storage):
        output_storage[0][0] = list(reversed(inputs[0]))


reverse = Reverse()


class Length(Op):
    __props__ = ()

    def make_node(self, x):
        from pytensor_tpu.tensor.type import TensorType

        return Apply(self, [x], [TensorType("int64", ())()])

    def perform(self, node, inputs, output_storage):
        output_storage[0][0] = np.asarray(len(inputs[0]), dtype="int64")


length = Length()


class Count(Op):
    __props__ = ()

    def make_node(self, x, elem):
        from pytensor_tpu.tensor.type import TensorType

        elem = x.type.ttype.filter_variable(elem)
        return Apply(self, [x, elem], [TensorType("int64", ())()])

    def perform(self, node, inputs, output_storage):
        x, e = inputs
        n = sum(1 for v in x if np.array_equal(np.asarray(v), np.asarray(e)))
        output_storage[0][0] = np.asarray(n, dtype="int64")


count = Count()


class Index(Op):
    """Position of the first matching element (reference typed_list
    Index op / list.index semantics)."""

    __props__ = ()

    def make_node(self, x, elem):
        from pytensor_tpu.tensor.type import TensorType

        elem = x.type.ttype.filter_variable(elem)
        return Apply(self, [x, elem], [TensorType("int64", ())()])

    def perform(self, node, inputs, output_storage):
        x, e = inputs
        for i, v in enumerate(x):
            if np.array_equal(np.asarray(v), np.asarray(e)):
                output_storage[0][0] = np.asarray(i, dtype="int64")
                return
        raise ValueError("element not in typed list")


index_ = Index()


class TypedListVariable(Variable):
    """Variable sugar for typed lists (reference typed_list/basic.py
    TypedListVariable): list-style methods build the corresponding ops."""

    def __getitem__(self, index):
        return getitem(self, index)

    def append(self, elem):
        return append(self, elem)

    def extend(self, other):
        return extend(self, other)

    def insert(self, index, elem):
        return insert(self, index, elem)

    def remove(self, elem):
        return remove(self, elem)

    def reverse(self):
        return reverse(self)

    def count(self, elem):
        return count(self, elem)

    def ind(self, elem):
        return index_(self, elem)


class TypedListConstant(Constant, TypedListVariable):
    pass


TypedListType.variable_type = TypedListVariable
TypedListType.constant_type = TypedListConstant


def _register_xla():
    """XLA path: a typed list is a trace-time-static python tuple of
    arrays (a pytree), so jit consumes it natively.  Structure-changing
    ops with *data-dependent* structure (insert/remove at a traced
    position) cannot lower — they need the oracle linker (PerformLinker);
    getitem at a traced index lowers to lax.switch over the elements.
    Reference executes these in C/py perform (typed_list/basic.py); the
    static-structure contract is the TPU-native equivalent.
    """
    from pytensor_tpu.link.xla.dispatch import xla_funcify

    def _static_index(i, what):
        try:
            return int(i)
        except Exception:
            return None

    # NOTE: list values are python LISTS on the trace (never tuples —
    # the linker's single-output convention reserves tuples for
    # multi-output ops); jit treats both as pytrees identically.

    @xla_funcify.register(MakeList)
    def _make_list(op, node=None, **kw):
        return lambda *elems: list(elems)

    @xla_funcify.register(GetItem)
    def _getitem(op, node=None, **kw):
        def getitem(x, i):
            k = _static_index(i, "getitem")
            if k is not None:
                return x[k]
            import jax

            i0 = jax.numpy.where(i < 0, i + len(x), i)
            return jax.lax.switch(i0, [lambda e=e: e for e in x])

        return getitem

    @xla_funcify.register(Append)
    def _append(op, node=None, **kw):
        return lambda x, e: list(x) + [e]

    @xla_funcify.register(Extend)
    def _extend(op, node=None, **kw):
        return lambda x, y: list(x) + list(y)

    @xla_funcify.register(Insert)
    def _insert(op, node=None, **kw):
        def insert(x, i, e):
            k = _static_index(i, "insert")
            if k is None:
                raise NotImplementedError(
                    "typed_list insert at a traced index changes the pytree "
                    "structure dynamically; use a constant index or the "
                    "PY (oracle) mode")
            x = list(x)
            return x[:k] + [e] + x[k:]

        return insert

    @xla_funcify.register(Remove)
    def _remove(op, node=None, **kw):
        def remove(x, e):
            raise NotImplementedError(
                "typed_list remove is data-dependent (list structure would "
                "depend on runtime values); use the PY (oracle) mode")

        return remove

    @xla_funcify.register(Reverse)
    def _reverse(op, node=None, **kw):
        return lambda x: list(reversed(list(x)))

    @xla_funcify.register(Length)
    def _length(op, node=None, **kw):
        import numpy as _np

        return lambda x: _np.int64(len(x))

    @xla_funcify.register(Count)
    def _count(op, node=None, **kw):
        def count(x, e):
            import jax.numpy as jnp

            hits = [jnp.all(el == e) for el in list(x)]
            return jnp.sum(jnp.stack(hits)).astype("int64")

        return count

    @xla_funcify.register(Index)
    def _index(op, node=None, **kw):
        def index(x, e):
            import jax.numpy as jnp

            hits = jnp.stack([jnp.all(el == e) for el in list(x)])
            # first match; no dynamic raise under jit — unmatched queries
            # are the caller's contract violation (reference raises)
            return jnp.argmax(hits).astype("int64")

        return index


_register_xla()
