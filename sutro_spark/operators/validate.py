"""Data-quality expectations: declarative constraint checks compiled
into ONE Spark aggregate per table (plus one tiny aggregate per
uniqueness/referential check).

North-star extension (the reference — /root/reference — validates only
its own payload shapes client-side, sdk.py; it has no relational data
plane). The shape follows the Great Expectations / Deequ idea: a
pipeline asserts expectations over each ingested table and gates
downstream stages on the violation report.

Scale design: every ROW-LEVEL expectation (not_null, min/max bounds,
set membership, regex) compiles to a conditional-sum column inside a
single global aggregate — one scan, one 1-row partial-aggregated
result, regardless of how many expectations are declared. Set-level
expectations need their own aggregation shape: ``unique`` is a
count-vs-distinct comparison (one shuffle on the column), and
``foreign_key`` is a left-anti join against the (usually broadcastable)
referenced key set. The report unions these tiny frames — each is a
handful of rows, so the union is free.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["expect", "validate"]


def expect(column: str, check: str, **params):
    """Declare one expectation; see ``validate`` for supported checks."""
    return {"column": column, "check": check, **params}


def _row_violation(e: dict) -> F.Column:
    c = F.col(e["column"])
    check = e["check"]
    if check == "not_null":
        return c.isNull()
    if check == "min":
        return c.isNotNull() & (c < F.lit(e["value"]))
    if check == "max":
        return c.isNotNull() & (c > F.lit(e["value"]))
    if check == "in_set":
        return c.isNotNull() & ~c.isin(list(e["values"]))
    if check == "regex":
        return c.isNotNull() & ~c.rlike(e["pattern"])
    raise ValueError(f"unknown row-level check {check!r}")


def _label(e: dict) -> str:
    check = e["check"]
    if check in ("min", "max"):
        return f"{check}({e['value']})"
    if check == "in_set":
        return f"in_set({','.join(str(v) for v in sorted(e['values']))})"
    if check == "regex":
        return f"regex({e['pattern']})"
    return check


def validate(df: DataFrame, expectations: list[dict]) -> DataFrame:
    """Run expectations against ``df``.

    Row-level checks: ``not_null``, ``min``/``max`` (value=), ``in_set``
    (values=), ``regex`` (pattern=) — NULLs only violate ``not_null``
    (bounds/sets/regex skip NULLs, mirroring SQL three-valued logic).
    Set-level: ``unique``; ``foreign_key`` (ref=DataFrame, ref_column=).

    Output: (column_name, check_name, n_rows bigint, n_violations
    bigint, passed int) — one row per expectation, deterministic
    content (names avoid the COLUMN/CHECK SQL keywords so the report
    itself stays oracle-queryable).
    """
    if not expectations:
        raise ValueError("no expectations given")
    row_level = [e for e in expectations if e["check"] not in ("unique", "foreign_key")]
    frames = []
    if row_level:
        aggs = [F.count(F.lit(1)).alias("__n")]
        for i, e in enumerate(row_level):
            aggs.append(
                F.sum(F.when(_row_violation(e), 1).otherwise(0)).alias(f"__v{i}")
            )
        one = df.agg(*aggs)
        frames.extend(
            one.select(
                F.lit(e["column"]).alias("column_name"),
                F.lit(_label(e)).alias("check_name"),
                F.col("__n").cast("long").alias("n_rows"),
                F.col(f"__v{i}").cast("long").alias("n_violations"),
            )
            for i, e in enumerate(row_level)
        )
    for e in expectations:
        if e["check"] == "unique":
            c = e["column"]
            frames.append(
                df.agg(
                    F.count(F.col(c)).alias("__n"),
                    F.count_distinct(F.col(c)).alias("__d"),
                ).select(
                    F.lit(c).alias("column_name"),
                    F.lit("unique").alias("check_name"),
                    F.col("__n").cast("long").alias("n_rows"),
                    (F.col("__n") - F.col("__d")).cast("long").alias("n_violations"),
                )
            )
        elif e["check"] == "foreign_key":
            c = e["column"]
            ref = e["ref"].select(F.col(e["ref_column"]).alias(c)).distinct()
            orphans = (
                df.select(c)
                .where(F.col(c).isNotNull())
                .join(F.broadcast(ref), c, "left_anti")
            )
            n_rows = df.select(c).where(F.col(c).isNotNull())
            frames.append(
                orphans.agg(F.count(F.lit(1)).alias("__v"))
                .crossJoin(n_rows.agg(F.count(F.lit(1)).alias("__n")))
                .select(
                    F.lit(c).alias("column_name"),
                    F.lit(f"foreign_key({e['ref_column']})").alias("check_name"),
                    F.col("__n").cast("long").alias("n_rows"),
                    F.col("__v").cast("long").alias("n_violations"),
                )
            )
    report = reduce(lambda a, b: a.unionAll(b), frames)
    return report.select(
        "column_name",
        "check_name",
        "n_rows",
        "n_violations",
        F.when(F.col("n_violations") == 0, 1).otherwise(0).cast("int").alias("passed"),
    )


def table_profile(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Deterministic per-column profile — the ``df.summary()`` shape
    but engine-reproducible (summary()'s approximate percentiles and
    float formatting are engine-private; this emits exact counts and
    lexicographic min/max as strings).

    For each column: row count, null count, exact distinct count, and
    min/max rendered via CAST AS STRING — exactly portable for
    integer and string columns; float/timestamp rendering is each
    engine's own, so prefer integer/string columns (or cast upstream)
    when the profile must match across engines.

    Plan: everything — row count, per-column null counts, min/max AND
    every per-column exact distinct count — rides ONE aggregate over
    ONE scan. Catalyst compiles multiple count(DISTINCT col_i) into a
    single Expand (one input row fans out to #distinct-groups rows
    before the partial aggregate), so profiling C columns costs one
    table pass regardless of C — at 100 TB that is the difference
    between one pass and C+1.

    MEASURED TRADE (round 5, do not "fix" backwards): at sf0.1 this
    one-pass plan is ~3x SLOWER than the previous C+1-scan version
    (0.65 s -> ~1.9 s idle-host) because locally the scan is cheap and
    the Expand row fan-out dominates. That is the right trade for the
    target: at 100 TB the scan dominates and one pass wins. If the
    local cost matters, or cardinalities are extreme, use the sketch
    variant below (functions/sketches.kmv/hll per column) instead of
    the exact distincts — same one-scan shape, constant Expand width.

    The single 1-row aggregate is then exploded into per-column rows
    driver-free (array-of-structs explode, no crossJoin/unionAll).

    Output: (column_name, n_rows bigint, n_nulls bigint, n_distinct
    bigint, min_value string, max_value string).
    """
    cols = columns or df.columns
    if not cols:
        raise ValueError("no columns to profile")
    base = df.agg(
        F.count(F.lit(1)).alias("__n"),
        *[
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"__null_{i}")
            for i, c in enumerate(cols)
        ],
        *[
            F.min(F.col(c).cast("string")).alias(f"__min_{i}")
            for i, c in enumerate(cols)
        ],
        *[
            F.max(F.col(c).cast("string")).alias(f"__max_{i}")
            for i, c in enumerate(cols)
        ],
        *[
            F.count_distinct(F.col(c)).alias(f"__d_{i}")
            for i, c in enumerate(cols)
        ],
    )
    per_col = F.array(
        *[
            F.struct(
                F.lit(c).alias("column_name"),
                F.col("__n").cast("long").alias("n_rows"),
                F.col(f"__null_{i}").cast("long").alias("n_nulls"),
                F.col(f"__d_{i}").cast("long").alias("n_distinct"),
                F.coalesce(F.col(f"__min_{i}"), F.lit("")).alias("min_value"),
                F.coalesce(F.col(f"__max_{i}"), F.lit("")).alias("max_value"),
            )
            for i, c in enumerate(cols)
        ]
    )
    return base.select(F.explode(per_col).alias("p")).select("p.*")


def json_key_profile(
    df: DataFrame,
    json_column: str,
) -> DataFrame:
    """Schema profile of a nested JSON string column — the drift alarm
    `table_profile` cannot give you: event ``props``, API payloads,
    and scraped metadata carry their real schema INSIDE a string
    column, where upstream producers silently add, drop, or re-type
    keys. Run per batch/day and diff: a key whose presence_milli
    moves, or whose numeric share collapses, is a producer change
    worth catching before it poisons a feature.

    Semantics: every top-level key of every row is counted
    (``from_json`` to ``map<string,string>`` — JSON scalars arrive as
    their unquoted token text); ``n_numeric`` counts values matching
    the integer/decimal token pattern, presence_milli =
    (1000 * n_present) div n_rows (rows with unparseable/NULL JSON
    count in the denominator — silent producer breakage should LOWER
    presence, not hide).

    Plan: one scan with a per-row map explode (top-level keys only —
    bounded by payload width, never corpus size), one
    map-side-combinable groupBy(key), a 1-row total broadcast.

    Output: (key, n_present, n_numeric, presence_milli), one row per
    key ever seen.
    """
    m = F.from_json(F.col(json_column), "map<string,string>")
    total = df.agg(F.count(F.lit(1)).cast("long").alias("n_rows"))
    kv = df.select(F.explode(m).alias("key", "value"))
    per_key = kv.groupBy("key").agg(
        F.count(F.lit(1)).cast("long").alias("n_present"),
        F.sum(
            F.when(
                F.col("value").rlike(r"^-?[0-9]+(\.[0-9]+)?$"), 1
            ).otherwise(0)
        )
        .cast("long")
        .alias("n_numeric"),
    )
    return (
        per_key.crossJoin(F.broadcast(total))
        .select(
            "key",
            "n_present",
            "n_numeric",
            F.expr(
                "CASE WHEN n_rows > 0 THEN"
                " CAST((1000 * n_present) div n_rows AS BIGINT)"
                " ELSE 0 END"
            ).alias("presence_milli"),
        )
        .orderBy("key")
    )
