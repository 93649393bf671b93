"""Vector column math over ``array<float>`` embeddings.

Everything is built from JVM-side higher-order functions
(``zip_with`` / ``aggregate``) — no Python UDF in the hot path.  The
folds are **sequential left folds**, which makes the float arithmetic
deterministic and bit-identical to the DuckDB oracle's
``list_reduce`` twin (same op order, same IEEE semantics).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(v: Column | str) -> Column:
    return F.col(v).cast("array<double>") if isinstance(v, str) else v.cast(
        "array<double>"
    )


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product (deterministic order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def sq_norm(a: Column) -> Column:
    return F.aggregate(
        F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (F.sqrt(sq_norm(a)) * F.sqrt(sq_norm(b)))


# DuckDB twins of the expressions above, for oracle SQL construction.
def duck_dot(a: str, b: str) -> str:
    return (
        f"list_reduce(list_transform(list_zip({a}, {b}), s -> s[1] * s[2]), "
        f"(x, y) -> x + y)"
    )


def duck_sq_norm(a: str) -> str:
    return f"list_reduce(list_transform({a}, x -> x * x), (x, y) -> x + y)"


def duck_cosine(a: str, b: str) -> str:
    return (
        f"({duck_dot(a, b)} / (sqrt({duck_sq_norm(a)}) * sqrt({duck_sq_norm(b)})))"
    )
