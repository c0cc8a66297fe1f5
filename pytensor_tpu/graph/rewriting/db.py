"""Tag-based rewrite registry and query.

Parallels /root/reference/pytensor/graph/rewriting/db.py
(RewriteDatabase:18, RewriteDatabaseQuery:186, EquilibriumDB:297,
SequenceDB:378).  Modes query the global ``optdb`` with include/exclude
tag sets to assemble their pass pipeline.
"""

from __future__ import annotations

import copy
import math
from functools import cmp_to_key
from typing import Iterable, Sequence

from pytensor_tpu.graph.rewriting.basic import (
    EquilibriumGraphRewriter,
    GraphRewriter,
    NodeRewriter,
    SequentialGraphRewriter,
    WalkingGraphRewriter,
)


class RewriteDatabase:
    def __init__(self):
        self._names: dict[str, object] = {}
        self._tags: dict[str, set[str]] = {}

    def register(self, name: str, rewriter, *tags, use_db_name_as_tag=True, **kwargs):
        if name in self._names:
            raise ValueError(f"Rewrite name collision: {name}")
        self._names[name] = rewriter
        tagset = {name, *tags}
        if use_db_name_as_tag and getattr(self, "name", None):
            tagset.add(self.name)
        # propagate inner db tags
        self._tags[name] = tagset
        return rewriter

    def add_tags(self, name, *tags):
        self._tags[name].update(tags)

    def remove_tags(self, name, *tags):
        self._tags[name].difference_update(tags)

    def __contains__(self, name):
        return name in self._names

    def __getitem__(self, name):
        return self._names[name]

    def _selected(self, name, query: "RewriteDatabaseQuery") -> bool:
        tags = self._tags[name]
        rewriter = self._names[name]
        if tags & query.exclude:
            return False
        if isinstance(rewriter, RewriteDatabase):
            # sub-db: always descend (its members filter themselves), unless
            # the whole group was excluded above
            return True
        # empty include selects nothing (an optimizer='None' query)
        return bool(tags & query.include)

    def query(self, query: "RewriteDatabaseQuery"):
        raise NotImplementedError

    def print_summary(self, stream=None):
        import sys

        stream = stream or sys.stdout
        print(f"{type(self).__name__} (id {id(self)})", file=stream)
        for name, tags in self._tags.items():
            print(f"  {name}: {sorted(tags)}", file=stream)


class RewriteDatabaseQuery:
    """Include/exclude tag sets used to select rewrites from a database."""

    def __init__(
        self,
        include: Iterable[str],
        require: Iterable[str] | None = None,
        exclude: Iterable[str] | None = None,
        subquery: dict | None = None,
        position_cutoff: float = math.inf,
        extra_rewrites: Sequence | None = None,
    ):
        self.include = frozenset(include)
        self.require = frozenset(require or ())
        self.exclude = frozenset(exclude or ())
        self.subquery = subquery or {}
        self.position_cutoff = position_cutoff
        self.extra_rewrites = list(extra_rewrites or ())

    def including(self, *tags) -> "RewriteDatabaseQuery":
        return RewriteDatabaseQuery(
            self.include | set(tags), self.require, self.exclude - set(tags),
            self.subquery, self.position_cutoff, self.extra_rewrites
        )

    def excluding(self, *tags) -> "RewriteDatabaseQuery":
        return RewriteDatabaseQuery(
            self.include - set(tags), self.require, self.exclude | set(tags),
            self.subquery, self.position_cutoff, self.extra_rewrites
        )

    def requiring(self, *tags) -> "RewriteDatabaseQuery":
        return RewriteDatabaseQuery(
            self.include, self.require | set(tags), self.exclude,
            self.subquery, self.position_cutoff, self.extra_rewrites
        )

    def register(self, *rewrites) -> "RewriteDatabaseQuery":
        return RewriteDatabaseQuery(
            self.include, self.require, self.exclude, self.subquery,
            self.position_cutoff, self.extra_rewrites + list(rewrites)
        )

    def __str__(self):
        return (
            f"RewriteDatabaseQuery(inc={sorted(self.include)}, "
            f"ex={sorted(self.exclude)}, req={sorted(self.require)})"
        )


class SequenceDB(RewriteDatabase):
    """Position-ordered database; query returns a SequentialGraphRewriter."""

    seq_rewriter = SequentialGraphRewriter

    def __init__(self, failure_callback=None, name=None):
        super().__init__()
        self.positions: dict[str, float] = {}
        self.failure_callback = failure_callback
        self.name = name

    def register(self, name, rewriter, *tags, position: float = 50.0, **kwargs):
        super().register(name, rewriter, *tags, **kwargs)
        self.positions[name] = float(position)
        return rewriter

    def query(self, query: RewriteDatabaseQuery, position_cutoff=None):
        if position_cutoff is None:
            position_cutoff = query.position_cutoff
        selected = []
        for name, rewriter in self._names.items():
            pos = self.positions[name]
            if pos >= position_cutoff:
                continue
            if not self._selected(name, query):
                continue
            if isinstance(rewriter, RewriteDatabase):
                sub_q = query.subquery.get(name, query)
                sub = rewriter.query(sub_q)
                selected.append((pos, sub))
            else:
                if getattr(rewriter, "wants_query", False):
                    # rewriters like the inner-graph bridge re-run the
                    # ACTIVE mode's pipeline inside HasInnerGraph ops
                    # (reference scan/rewriting/db.py:260): hand them the
                    # query they were selected under
                    rewriter = rewriter.bind_query(query)
                selected.append((pos, rewriter))
        selected.sort(key=lambda t: t[0])
        rewriters = [r for _, r in selected]
        for extra in query.extra_rewrites:
            rewriters.append(extra)
        return self.seq_rewriter(rewriters, name=self.name)


class EquilibriumDB(RewriteDatabase):
    """Database whose query returns an EquilibriumGraphRewriter over the
    selected node rewriters."""

    def __init__(self, ignore_newtrees=True, name=None):
        super().__init__()
        self.ignore_newtrees = ignore_newtrees
        self.name = name
        self._final: set[str] = set()
        self._cleanup: set[str] = set()

    def register(self, name, rewriter, *tags, final_rewriter=False,
                 cleanup=False, **kwargs):
        super().register(name, rewriter, *tags, **kwargs)
        if final_rewriter:
            self._final.add(name)
        if cleanup:
            self._cleanup.add(name)
        return rewriter

    def query(self, query: RewriteDatabaseQuery):
        selected = []
        for name, rewriter in self._names.items():
            if not self._selected(name, query):
                continue
            if isinstance(rewriter, RewriteDatabase):
                sub_q = query.subquery.get(name, query)
                selected.append(rewriter.query(sub_q))
            else:
                selected.append(rewriter)
        selected.extend(query.extra_rewrites)
        return EquilibriumGraphRewriter(
            selected, max_use_ratio=8.0, ignore_newtrees=self.ignore_newtrees,
            name=self.name
        )


class TopoDB(RewriteDatabase):
    """Database of node rewriters applied in a single topological pass."""

    def __init__(self, order="in_to_out", name=None):
        super().__init__()
        self.order = order
        self.name = name

    def register(self, name, rewriter, *tags, **kwargs):
        return super().register(name, rewriter, *tags, **kwargs)

    def query(self, query):
        from pytensor_tpu.graph.rewriting.basic import SequentialNodeRewriter

        selected = [
            r for name, r in self._names.items() if self._selected(name, query)
        ]
        selected.extend(query.extra_rewrites)
        return WalkingGraphRewriter(
            SequentialNodeRewriter(*selected, name=self.name), order=self.order,
            name=self.name
        )


class LocalGroupDB(SequenceDB):
    """Ordered group of node rewriters combined into one."""

    def query(self, query, position_cutoff=None):
        if position_cutoff is None:
            position_cutoff = query.position_cutoff
        from pytensor_tpu.graph.rewriting.basic import SequentialNodeRewriter

        selected = [
            (self.positions[name], r)
            for name, r in self._names.items()
            if self.positions[name] < position_cutoff and self._selected(name, query)
        ]
        selected.sort(key=lambda t: t[0])
        return SequentialNodeRewriter(*[r for _, r in selected], name=self.name)


class ProxyDB(RewriteDatabase):
    """Wraps another database (used to expose sub-dbs under new names)."""

    def __init__(self, db):
        super().__init__()
        self.db = db

    def query(self, query):
        return self.db.query(query)
