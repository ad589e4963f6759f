"""Expression-composition helpers shared across the function library."""

from __future__ import annotations

import functools

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["let_col", "memo_expr"]


def memo_expr(fn):
    """Memoize a pure Column-builder on its arguments' expression text.

    The heavy text expressions (language_id, quality_score: ~0.1 s of
    py4j round-trips EACH to build their stopword/score trees) are pure
    functions of their input expressions, and Column objects are
    immutable — the same tree can appear in any number of plans. Keying
    on ``str(col)`` (the JVM expression string) makes the cache exact:
    two calls build the same tree iff their inputs print the same.

    Scalar kwargs join the key; Columns are keyed by their repr. The
    cache holds py4j refs, which live as long as the process's gateway —
    correct for every launcher in this repo (one JVM per process)."""

    def _key(v):
        return f"C:{v}" if isinstance(v, Column) else v

    cache: dict = {}

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        key = (
            tuple(_key(a) for a in args),
            tuple(sorted((k, _key(v)) for k, v in kwargs.items())),
        )
        try:
            hit = cache.get(key)
        except TypeError:  # unhashable arg: build uncached
            return fn(*args, **kwargs)
        if hit is None:
            hit = cache[key] = fn(*args, **kwargs)
        return hit

    wrapped.cache_clear = cache.clear  # parity with lru_cache for tests
    return wrapped


def let_col(value: Column, body) -> Column:
    """Let-binding for Column expressions: evaluate ``value`` once per row,
    bind it as a lambda variable in ``body``.

    Composing multi-step pipelines in one Column duplicates every subtree
    at each reference site — trees explode combinatorially and evaluation
    goes off the codegen path (a 20k-row query took 208 s before this was
    applied to ``make_source_name``). A bound lambda variable is a cheap
    attribute read, keeping the tree linear in pipeline length.

    CAUTION: the lambda passed to ``body`` must take exactly ONE argument.
    PySpark gives a two-argument lambda ``(element, index)`` — a default-
    argument trick like ``lambda x, i=i:`` silently receives the array
    index as ``i``.
    """
    return F.element_at(F.transform(F.array(value), body), 1)
