"""Vector math over array<float|double> columns — pure Catalyst
higher-order functions (zip_with / aggregate), JVM-side. Sums run in
element order so results are bit-reproducible across engines that do
the same (DuckDB list_dot_product)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a, b) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a, b) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_rounded(a, b, digits: int = 6) -> Column:
    """Cosine rounded to kill last-ulp differences between engines'
    summation; use this whenever the value feeds a comparison or an
    output checked across engines."""
    return F.round(cosine(a, b), digits)
