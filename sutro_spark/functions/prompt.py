"""Prompt-assembly expressions (SURVEY.md §2.2 P2/P3/P13).

Pure Catalyst expressions — no UDFs — so concat folds into whole-stage
codegen and survives column pruning.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def concat_prompt(df: DataFrame, parts: list[str] | str) -> Column:
    """P2 — multi-column concat with literal separators.

    Reference (/root/reference/sutro/common.py:77-113): the list mixes
    column names and literal strings; a name not in the table is treated
    as a literal; nulls become ``""``; every column is cast to string;
    separator is '' and nulls are ignored (polars
    ``concat_str(sep="", ignore_nulls=True)``).

    Spark: ``concat(coalesce(cast(c as string), '') | lit(part), ...)``.
    """
    if isinstance(parts, str):
        parts = [parts]
    cols = []
    for part in parts:
        if part in df.columns:
            cols.append(F.coalesce(F.col(part).cast("string"), F.lit("")))
        else:
            cols.append(F.lit(part))
    return F.concat(*cols) if cols else F.lit("")


def labeled_concat(df: DataFrame, labels: list[str]) -> Column:
    """P3 — rank's labeled option concat.

    Reference (/root/reference/sutro/templates/evals.py:130-139):
    interleave ``label + ":"`` literals with the label's column, joined
    by single spaces, ``ignore_nulls=False`` — i.e. a null option value
    nulls the whole prompt row. Spark ``F.concat`` already propagates
    nulls, so build explicit spaces with ``concat`` (NOT ``concat_ws``,
    which skips nulls).
    """
    pieces: list[Column] = []
    for i, label in enumerate(labels):
        if i:
            pieces.append(F.lit(" "))
        pieces.append(F.lit(f"{label}:"))
        pieces.append(F.lit(" "))
        pieces.append(F.col(label).cast("string"))
    return F.concat(*pieces)


def normalize_output_schema(output_schema) -> dict:
    """P13 — Pydantic class → JSON schema dict; dict passthrough; else error.

    Mirrors /root/reference/sutro/common.py:170-181 (client-side helper,
    pure Python — nothing Spark-specific to do here).
    """
    if isinstance(output_schema, dict):
        return output_schema
    model_json_schema = getattr(output_schema, "model_json_schema", None)
    if callable(model_json_schema):
        return model_json_schema()
    raise ValueError(
        "output_schema must be a dict JSON schema or a class with model_json_schema()"
    )
