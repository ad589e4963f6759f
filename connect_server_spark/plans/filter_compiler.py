"""Filter-expression compiler: ``(field, op, value)`` tuples → Spark Columns.

Re-expresses the reference's DynamoDB scan surface
(``aws/dynamo_manager.py:127-286`` — ``scan_table(table, fields, filters)``
with a tiny operator language compiled to ``FilterExpression`` /
``ProjectionExpression``) as declarative DataFrame operations.

Operator language (semantics per ``aws/dynamo_manager.py:147-163``):

    ^    begins with
    *    contains (substring on strings, membership on arrays)
    ==   equal to            (field does not exist / is null, if value is None)
    !=   not equal to        (field exists / is not null,     if value is None)
    >    greater than
    >=   greater than or equal to
    <    less than
    <=   less than or equal to
    []   between, inclusive  (requires a list of two values)
    in   is one of the values (requires a list) — the documented way to OR
         equalities (`aws/dynamo_manager.py:160-162`)

All filters are AND-ed (`aws/dynamo_manager.py:252-258`).

Scale note: every compiled predicate is a plain Catalyst expression, so
parquet predicate pushdown, partition pruning, and whole-stage codegen all
apply for free — the DynamoDB "server-side filter" becomes a scan-level
filter on a 1000-executor cluster. Projection (`fields`) becomes column
pruning and reaches the parquet reader as `ReadSchema`.
"""

from __future__ import annotations

from functools import reduce
from typing import Iterable, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

__all__ = [
    "FilterCompileError",
    "compile_filters",
    "scan_table",
    "try_scan_table",
    "user_scoped_filters",
]

FilterTuple = tuple  # (field: str, op: str, value)


class FilterCompileError(ValueError):
    """Raised for invalid operators/values — mirrors the reference's
    ``{"success": False, "error": ...}`` returns (``aws/dynamo_manager.py:235-244``)."""


def _compile_one(df: DataFrame, fil: Sequence) -> Column:
    if not isinstance(fil, (tuple, list)) or len(fil) != 3:
        raise FilterCompileError(f"Invalid filter (need (field, op, value)): '{fil}'")
    field, op, value = fil
    col = F.col(field)

    if op == "^":
        return col.startswith(value)
    if op == "*":
        # DynamoDB `contains` is substring on strings, membership on sets.
        try:
            dtype = df.schema[field].dataType
        except KeyError:
            dtype = StringType()
        if isinstance(dtype, ArrayType):
            return F.array_contains(col, value)
        return col.contains(value)
    if op == "==":
        return col.isNull() if value is None else (col == value)
    if op == "!=":
        return col.isNotNull() if value is None else (col != value)
    if op == ">":
        return col > value
    if op == ">=":
        return col >= value
    if op == "<":
        return col < value
    if op == "<=":
        return col <= value
    if op == "[]":
        if not isinstance(value, list) or len(value) != 2:
            raise FilterCompileError(
                f"Invalid between ('[]') operator values: '{value}'"
            )
        return col.between(value[0], value[1])
    if op == "in":
        if not isinstance(value, list):
            raise FilterCompileError(f"Invalid 'in' operator values: '{value}'")
        return col.isin(value)
    raise FilterCompileError(f"Invalid filter operator '{op}'")


def compile_filters(df: DataFrame, filters) -> Column | None:
    """Compile a filter list into a single AND-ed Column (None = no filter)."""
    if isinstance(filters, tuple):
        filters = [filters]
    if filters is None or (isinstance(filters, list) and len(filters) == 0):
        return None
    if not isinstance(filters, list):
        raise FilterCompileError(
            f"Invalid filters type {type(filters)}: '{filters}'"
        )
    preds = [_compile_one(df, fil) for fil in filters]
    return reduce(lambda a, b: a & b, preds)


def _projection(df: DataFrame, fields) -> DataFrame:
    """fields: None = all, str = comma-separated names, list = names
    (``aws/dynamo_manager.py:166-175``)."""
    if fields is None:
        return df
    if isinstance(fields, str):
        fields = [f.strip() for f in fields.split(",") if f.strip()]
    elif not isinstance(fields, list):
        raise FilterCompileError(
            f"Invalid fields type {type(fields)}: '{fields}'"
        )
    return df.select(*fields)


def scan_table(df: DataFrame, fields=None, filters=None) -> DataFrame:
    """Scan with projection + compiled filters.

    Pagination (`LastEvaluatedKey` loops, ``aws/dynamo_manager.py:260-281``)
    needs no analog: a partitioned parquet scan is already set-oriented.
    """
    pred = compile_filters(df, filters)
    if pred is not None:
        df = df.filter(pred)
    return _projection(df, fields)


def try_scan_table(df: DataFrame, fields=None, filters=None) -> dict:
    """Result-convention variant mirroring the reference's
    ``{"success": bool, "results"/"error": ...}`` shape."""
    try:
        return {"success": True, "results": scan_table(df, fields, filters)}
    except FilterCompileError as e:
        return {"success": False, "error": str(e)}


def user_scoped_filters(filters, user_id: str, field: str = "user_id"):
    """Row-level security: prepend the mandatory user-scope conjunct
    (``aws/submissions.py:73-76``)."""
    provided = list(filters) if filters else []
    return [(field, "==", user_id)] + provided
