"""Small support utilities shared across the framework.

Role parallels ``pytensor/utils.py`` + ``pytensor/graph/utils.py`` in the
reference (see /root/reference/pytensor/graph/utils.py:187 ``MetaType``):
``__props__``-driven equality/hash for Ops and Types, scratchpads for
variable tags, and misc helpers.  Implementation is original.
"""

from __future__ import annotations

import traceback
from typing import Any


class MetaObject:
    """Objects whose identity is defined by their ``__props__``.

    Two instances of the same class with equal props compare equal and hash
    equal.  This is what lets the graph-merge (CSE) pass unify structurally
    identical Apply nodes.
    """

    __props__: tuple[str, ...] = ()

    def _props(self) -> tuple:
        return tuple(getattr(self, p) for p in self.__props__)

    def _props_dict(self) -> dict[str, Any]:
        return {p: getattr(self, p) for p in self.__props__}

    def __eq__(self, other) -> bool:
        return type(self) is type(other) and self._props() == other._props()

    def __hash__(self) -> int:
        return hash((type(self), self._props()))

    def __str__(self) -> str:
        if not self.__props__:
            return type(self).__name__
        parts = ", ".join(f"{p}={getattr(self, p)!r}" for p in self.__props__)
        return f"{type(self).__name__}{{{parts}}}"

    def __repr__(self) -> str:
        return str(self)


class Scratchpad:
    """Attribute bag used as ``Variable.tag`` / ``Apply.tag``."""

    def __update__(self, other: "Scratchpad") -> "Scratchpad":
        self.__dict__.update(other.__dict__)
        return self

    def __str__(self) -> str:
        return "scratchpad" + str(self.__dict__)

    def __repr__(self) -> str:
        return str(self)


class ValidatingScratchpad(Scratchpad):
    """Scratchpad that filters a given attribute through a function."""

    def __init__(self, attr, attr_filter):
        object.__setattr__(self, "attr", attr)
        object.__setattr__(self, "attr_filter", attr_filter)

    def __setattr__(self, attr, obj):
        if attr == getattr(self, "attr"):
            obj = getattr(self, "attr_filter")(obj)
        object.__setattr__(self, attr, obj)


class Singleton(MetaObject):
    """Classes with a unique instance, accessible via ``cls()``."""

    _instance = None

    def __new__(cls):
        if cls._instance is None or type(cls._instance) is not cls:
            cls._instance = super().__new__(cls)
        return cls._instance


def add_tag_trace(thing, user_line: int | None = None):
    """Attach a creation traceback to a Variable/Apply ``tag``.

    Mirrors the provenance mechanism of the reference
    (graph/utils.py:76): runtime and rewrite errors are re-raised with the
    original user stack so graph errors point at model code.
    """
    from pytensor_tpu.config import config

    limit = config.traceback__limit
    if limit == 0:
        thing.tag.trace = []
        return thing
    tr = traceback.extract_stack(limit=limit + 4)[:-2]
    # drop frames inside this package
    tr = [t for t in tr if "pytensor_tpu" not in (t.filename or "")]
    thing.tag.trace = [tr]
    return thing


def hash_from_code(msg) -> str:
    import hashlib

    if isinstance(msg, str):
        msg = msg.encode()
    return hashlib.sha256(msg).hexdigest()


def flatten(lst):
    """Flatten nested lists/tuples into a flat list."""
    out = []
    for item in lst:
        if isinstance(item, (list, tuple)):
            out.extend(flatten(item))
        else:
            out.append(item)
    return out


def uniq(seq):
    """Stable unique."""
    seen = set()
    out = []
    for s in seq:
        if s not in seen:
            seen.add(s)
            out.append(s)
    return out


def difference(seq1, seq2):
    """Elements of seq1 not in seq2, preserving order."""
    s2 = set(seq2)
    return [x for x in seq1 if x not in s2]


def from_return_values(values):
    if isinstance(values, (list, tuple)):
        return list(values)
    return [values]


def to_return_values(values):
    if len(values) == 1:
        return values[0]
    return values


def may_share_memory(a, b, raise_other_type=True):
    """Whether two values may alias (reference pytensor/misc/may_share_memory).

    numpy arrays use ``np.may_share_memory``; jax device arrays are
    immutable so aliasing is never observable — returns False; sparse
    values compare their underlying data/index arrays.
    """
    import numpy as np

    def _np_parts(v):
        try:
            import scipy.sparse as sp

            if sp.issparse(v):
                return [v.data, v.indices, v.indptr]
        except Exception:
            pass
        if isinstance(v, np.ndarray):
            return [v]
        return None

    pa, pb = _np_parts(a), _np_parts(b)
    if pa is None or pb is None:
        try:
            import jax

            if isinstance(a, jax.Array) or isinstance(b, jax.Array):
                return False
        except Exception:
            pass
        if raise_other_type:
            raise TypeError("may_share_memory supports numpy/scipy/jax values")
        return False
    return any(np.may_share_memory(x, y) for x in pa for y in pb)


class frozendict(dict):
    """Immutable dict (reference pytensor/misc/frozendict.py behavior)."""

    def _blocked(self, *a, **k):
        raise TypeError("frozendict is immutable")

    __setitem__ = __delitem__ = _blocked
    pop = popitem = setdefault = update = clear = _blocked

    def __hash__(self):
        return hash(frozenset(self.items()))


class OrderedSet:
    """Insertion-ordered set (dict-backed; reference misc/ordered_set.py)."""

    def __init__(self, iterable=()):
        self._d = dict.fromkeys(iterable)

    def add(self, item):
        self._d[item] = None

    def discard(self, item):
        self._d.pop(item, None)

    remove = discard

    def update(self, iterable):
        for i in iterable:
            self._d[i] = None

    def __contains__(self, item):
        return item in self._d

    def __iter__(self):
        return iter(self._d)

    def __len__(self):
        return len(self._d)

    def __or__(self, other):
        out = OrderedSet(self)
        out.update(other)
        return out

    def __sub__(self, other):
        other = set(other)
        return OrderedSet(x for x in self if x not in other)

    def __repr__(self):
        return f"OrderedSet({list(self._d)!r})"
