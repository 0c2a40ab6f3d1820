"""Structured-output unpacking (SURVEY.md §2.2 P6/P7/P8).

Reference behavior (/root/reference/sutro/sdk.py:1278-1320):
- probe row 0 with ``json.loads``; undecodable → silently leave the raw
  column in place;
- error if any decoded top-level field collides with an existing column;
- promote every top-level field to its own column and drop the raw one;
- if the fields are exactly ``{content, reasoning_content}`` (reasoning
  models), additionally flatten ``content.*`` and drop ``content``.

Spark-first difference: when the job declared an ``output_schema`` we
*know* the struct type — no row-0 sniffing, and the unpack is a pure
Catalyst ``from_json`` + ``select("s.*")`` (columnar, codegen'd,
pushdown-friendly). Sniffing survives only as the fallback for
schema-less outputs, implemented as a driver-side single-row probe via
``schema_of_json`` — one row, not a scan.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_TMP = "__unpacked"


def json_schema_to_spark(schema: dict) -> T.StructType:
    """Convert a (reference-style, common.py:170-181) JSON schema dict to
    a Spark StructType. Supports the subset the reference's templates
    declare: string (+enum), integer, number, boolean, array, object."""

    def conv(spec: dict) -> T.DataType:
        typ = spec.get("type")
        if typ == "string":
            return T.StringType()
        if typ == "integer":
            return T.LongType()
        if typ == "number":
            return T.DoubleType()
        if typ == "boolean":
            return T.BooleanType()
        if typ == "array":
            return T.ArrayType(conv(spec.get("items", {"type": "string"})))
        if typ == "object":
            return T.StructType(
                [
                    T.StructField(k, conv(v), True)
                    for k, v in spec.get("properties", {}).items()
                ]
            )
        return T.StringType()

    top = conv(schema)
    if not isinstance(top, T.StructType):
        raise ValueError("output_schema must describe a JSON object")
    return top


def unpack_json_outputs(
    df: DataFrame,
    column: str = "outputs",
    output_schema: dict | None = None,
) -> DataFrame:
    """P6 — promote JSON fields of ``column`` to top-level columns.

    Reproduces the reference's observable rules (collision ValueError,
    silent no-op on undecodable row-0, reasoning-model content
    flattening); see module docstring for the file:line map.
    """
    if output_schema is not None:
        struct = json_schema_to_spark(output_schema)
    else:
        probe = df.select(column).first()
        raw = probe[0] if probe is not None else None
        if raw is None:
            return df
        try:
            decoded = json.loads(raw)
        except (json.JSONDecodeError, TypeError):
            return df  # sdk.py:1317-1320 — leave raw column untouched
        if not isinstance(decoded, dict):
            return df
        schema_str = df.select(F.schema_of_json(F.lit(raw)).alias("s")).first()["s"]
        parsed = T._parse_datatype_string(schema_str)
        if not isinstance(parsed, T.StructType):
            return df
        struct = parsed

    fields = [f.name for f in struct.fields]
    existing = [c for c in df.columns if c != column]
    collisions = sorted(set(fields) & set(existing))
    if collisions:
        raise ValueError(
            "JSON fields collide with existing columns: "
            + ", ".join(collisions)
            + " (rename or drop them before unpacking)"  # sdk.py:1290-1297
        )

    unpacked = df.withColumn(_TMP, F.from_json(F.col(column), struct))
    cols = [F.col(c) for c in existing] + [F.col(f"{_TMP}.{f}").alias(f) for f in fields]
    out = unpacked.select(*cols)

    # Reasoning-model shape: exactly {content, reasoning_content} with a
    # struct content → flatten content.* (sdk.py:1300-1316).
    if set(fields) == {"content", "reasoning_content"}:
        content_type = out.schema["content"].dataType
        if isinstance(content_type, T.StructType):
            inner = [f.name for f in content_type.fields]
            inner_collisions = sorted(set(inner) & set(existing + ["reasoning_content"]))
            if inner_collisions:
                raise ValueError(
                    "JSON fields collide with existing columns: " + ", ".join(inner_collisions)
                )
            out = out.select(
                *[F.col(c) for c in existing],
                *[F.col(f"content.{f}").alias(f) for f in inner],
                F.col("reasoning_content"),
            )
    return out


def strip_scratchpad(
    df: DataFrame, column: str = "outputs", field: str = "classification"
) -> DataFrame:
    """P7 — classify's post-step: keep only the classification field
    (reference: templates/classification.py:107-115)."""
    return df.withColumn(
        column,
        F.from_json(F.col(column), f"scratchpad string, {field} string").getField(field),
    )


def decode_ranking(
    df: DataFrame, column: str = "outputs", ranking_column: str = "ranking"
) -> DataFrame:
    """P8 — rank's post-step: JSON → array<string> ranking column
    (reference: templates/evals.py:156-166)."""
    return df.withColumn(
        ranking_column,
        F.from_json(F.col(column), f"{ranking_column} array<string>").getField(ranking_column),
    ).drop(column)
