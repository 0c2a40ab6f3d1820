"""Vector math over array<float|double> columns — pure Catalyst
higher-order functions (zip_with / aggregate), JVM-side. Sums run in
element order so results are bit-reproducible across engines that do
the same (DuckDB list_dot_product)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a, b, dim: int | None = None) -> Column:
    """Sequential-order dot product (left-associated sum, so the bits
    match any engine that also sums in element order).

    With ``dim`` known statically the sum is unrolled into a flat
    ``e1*e1 + e2*e2 + ...`` expression — whole-stage-codegen'd, ~10×
    faster than the interpreted higher-order-function path, identical
    value (x+0.0 == x for the HOF's init term)."""
    if dim is not None:
        acc = None
        for i in range(1, dim + 1):
            term = F.element_at(a, i).cast("double") * F.element_at(b, i).cast("double")
            acc = term if acc is None else acc + term
        return acc
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a, dim: int | None = None) -> Column:
    return F.sqrt(dot(a, a, dim))


def cosine(a, b, dim: int | None = None) -> Column:
    return dot(a, b, dim) / (norm(a, dim) * norm(b, dim))


def cosine_rounded(a, b, digits: int = 6, dim: int | None = None) -> Column:
    """Cosine rounded to kill last-ulp differences between engines'
    summation; use this whenever the value feeds a comparison or an
    output checked across engines."""
    return F.round(cosine(a, b, dim), digits)
