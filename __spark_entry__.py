"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship pipeline smoke check at sf0.001.
``queries()`` — one entry per implemented operator from SURVEY.md §2.
``oracle_sql()`` — matching DuckDB ANSI-SQL strings.

Column names are aliased identically on both sides; floating-point
aggregates are rounded identically on both sides so value hashes match
bit-for-bit.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from sutro_spark.functions.prompt import concat_prompt, labeled_concat
from sutro_spark.operators.elo import pairwise_counts
from sutro_spark.operators.results import order_results, positional_join
from sutro_spark.operators.templates import classify, embed, rank, score
from sutro_spark.operators.transform import llm_transform
from sutro_spark.operators.unpack import unpack_json_outputs
from sutro_spark.sources.ingest import ROW_ID, read_csv, with_row_id

FLAGSHIP_SCHEMA = {
    "type": "object",
    "properties": {
        "summary": {"type": "string"},
        "quality": {"type": "integer", "minimum": 1, "maximum": 5},
    },
}

CLASSES = ["news", "blog", "code"]
RANK_LABELS = ["opt_a", "opt_b", "opt_c"]


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------------------
# flagship: scan → row_id → prompt concat (P2) → stub LLM transform (U1)
# → JSON unpack (P6) → ordered results (P5/J1).
# ---------------------------------------------------------------------------
def _flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = with_row_id(_t(spark, sf_dir, "documents"), order_by=["doc_id"])
    docs = docs.withColumn(
        "prompt", concat_prompt(docs, ["Summarize: ", "text", " [", "lang", "]"])
    )
    out = llm_transform(
        docs, "prompt", output_schema=FLAGSHIP_SCHEMA, include_logprobs=True
    )
    out = unpack_json_outputs(out, "outputs", FLAGSHIP_SCHEMA)
    return order_results(out, "summary", include_logprobs=True).select(
        "doc_id", "summary", "quality", "cumulative_logprobs"
    )


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _flagship(spark, "/root/testdata/sf0.001")


# ---------------------------------------------------------------------------
# individual queries
# ---------------------------------------------------------------------------
def q_select_prompt_column(spark: SparkSession, sf_dir: str) -> DataFrame:
    # P1 — project the prompt column (common.py:134).
    return _t(spark, sf_dir, "documents").select("doc_id", F.col("text").alias("prompt"))


def q_prompt_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    # P2 — mixed columns/literals, unknown names → literals, nulls → "".
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        concat_prompt(docs, ["[", "lang", "|", "source", "] ", "text"]).alias("prompt"),
    )


def q_labeled_concat_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    # P3 — labeled concat with ignore_nulls=False: null option → null prompt.
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.substring("text", 1, 20).alias("opt_a"),
        F.nullif(F.col("lang"), F.lit("en")).alias("opt_b"),
    )
    return docs.select(
        "doc_id", labeled_concat(docs, ["opt_a", "opt_b"]).alias("prompt")
    )


def q_flagship_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _flagship(spark, sf_dir)


def q_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    # U3 + P7 — classify with scratchpad strip; stub picks
    # classes[length(prompt) % 3].
    docs = _t(spark, sf_dir, "documents")
    out = classify(docs, CLASSES, "text")
    return out.select("doc_id", "classification")


def q_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    # U4 — judge score joined back onto the input table.
    docs = _t(spark, sf_dir, "documents")
    out = score(docs, "clarity", "text", score_range=(1, 10))
    return out.select("doc_id", "lang", "score")


def _ranked(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.substring("text", 1, 10).alias("opt_a"),
        F.substring("text", 11, 10).alias("opt_b"),
        F.substring("text", 21, 10).alias("opt_c"),
    )
    return rank(docs, RANK_LABELS, "brevity")


def q_rank_exploded(spark: SparkSession, sf_dir: str) -> DataFrame:
    # U5 + P8 — ranking array decoded, exploded to (doc_id, pos, label).
    return _ranked(spark, sf_dir).select(
        "doc_id", F.posexplode("ranking").alias("pos", "label")
    )


def q_pairwise_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    # A1 — ballots → pairwise win counts (pure relational explode+join).
    return pairwise_counts(_ranked(spark, sf_dir), "ranking").select(
        "winner", "loser", "wins", "ties"
    )


def q_embed(spark: SparkSession, sf_dir: str) -> DataFrame:
    # U2 — stub embedding; expose element 0 and an order-stable sum.
    docs = _t(spark, sf_dir, "documents")
    out = embed(docs, "text", dim=8)
    return out.select(
        "doc_id",
        F.element_at("embedding", 1).alias("v0"),
        F.round(
            F.aggregate("embedding", F.lit(0.0), lambda acc, x: acc + x), 6
        ).alias("vsum"),
    )


def q_positional_zip(spark: SparkSession, sf_dir: str) -> DataFrame:
    # J1 — positional join of two frames via the row_id convention.
    docs = _t(spark, sf_dir, "documents")
    left = with_row_id(docs.select("doc_id", "text"), order_by=["doc_id"])
    right = with_row_id(
        docs.select(F.col("doc_id").alias("d2"), "n_chars"), order_by=["d2"]
    ).drop("d2")
    return positional_join(left, right).select("doc_id", "n_chars")


def q_csv_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    # S4 — CSV scan: round-trip nation through CSV, read with our reader.
    import tempfile

    path = os.path.join(tempfile.gettempdir(), "sutro_spark_nation_csv")
    _t(spark, sf_dir, "nation").orderBy("n_nationkey").coalesce(1).write.mode(
        "overwrite"
    ).option("header", True).csv(path)
    df = read_csv(spark, path)
    return df.select(
        F.col("n_nationkey").cast("long").alias("n_nationkey"),
        "n_name",
        F.col("n_regionkey").cast("long").alias("n_regionkey"),
    )


def q_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Standard relational agg (SURVEY §2.5 note): TPC-H Q1 shape.
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def q_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    # F1+F2+F3+P9+P10+P12 — the "jobs list" CLI shape over orders:
    # null filter, sort desc, limit 25, date format, currency format.
    o = _t(spark, sf_dir, "orders")
    return (
        o.where(F.col("o_orderdate").isNotNull())
        .orderBy(F.desc("o_orderdate"), F.desc("o_orderkey"))
        .limit(25)
        .select(
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss").alias("created"),
            F.format_string(
                "$%.5f", F.coalesce(F.col("o_totalprice"), F.lit(0.0))
            ).alias("cost"),
            F.coalesce(F.col("o_orderpriority"), F.lit("")).alias("priority"),
        )
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "select_prompt_column": q_select_prompt_column,
        "prompt_concat": q_prompt_concat,
        "labeled_concat_nulls": q_labeled_concat_nulls,
        "flagship_extract": q_flagship_extract,
        "classify": q_classify,
        "score": q_score,
        "rank_exploded": q_rank_exploded,
        "pairwise_counts": q_pairwise_counts,
        "embed": q_embed,
        "positional_zip": q_positional_zip,
        "csv_scan": q_csv_scan,
        "tpch_q1": q_tpch_q1,
        "top_orders": q_top_orders,
    }


# ---------------------------------------------------------------------------
# DuckDB oracles — mirror the stub backend rules documented in
# sutro_spark/operators/backends.py (pure functions of the prompt).
# ---------------------------------------------------------------------------
_FLAGSHIP_PROMPT = (
    "'Summarize: ' || coalesce(CAST(text AS VARCHAR), '') || ' [' || "
    "coalesce(lang, '') || ']'"
)

_RANK_PROMPT = (
    "'opt_a: ' || substr(text, 1, 10) || ' opt_b: ' || substr(text, 11, 10) "
    "|| ' opt_c: ' || substr(text, 21, 10)"
)


def oracle_sql() -> dict[str, str]:
    return {
        "select_prompt_column": "SELECT doc_id, text AS prompt FROM documents",
        "prompt_concat": """
            SELECT doc_id,
                   '[' || coalesce(lang, '') || '|' || coalesce(source, '')
                       || '] ' || coalesce(CAST(text AS VARCHAR), '') AS prompt
            FROM documents
        """,
        "labeled_concat_nulls": """
            SELECT doc_id,
                   'opt_a: ' || substr(text, 1, 20) || ' opt_b: '
                       || nullif(lang, 'en') AS prompt
            FROM documents
        """,
        "flagship_extract": f"""
            WITH p AS (
                SELECT doc_id, {_FLAGSHIP_PROMPT} AS prompt FROM documents
            )
            SELECT doc_id,
                   upper(substr(prompt, 1, 12)) AS summary,
                   CAST(1 + (length(prompt) + 1) % 5 AS BIGINT) AS quality,
                   -CAST(length(prompt) AS DOUBLE) / 100 AS cumulative_logprobs
            FROM p
        """,
        "classify": """
            SELECT doc_id,
                   (['news', 'blog', 'code'])[length(coalesce(CAST(text AS VARCHAR), '')) % 3 + 1]
                       AS classification
            FROM documents
        """,
        "score": """
            SELECT doc_id, lang,
                   CAST(1 + length(coalesce(CAST(text AS VARCHAR), '')) % 10 AS BIGINT) AS score
            FROM documents
        """,
        "rank_exploded": f"""
            WITH p AS (
                SELECT doc_id, length({_RANK_PROMPT}) AS n FROM documents
            )
            SELECT doc_id,
                   CAST(pos AS INTEGER) AS pos,
                   (['opt_a', 'opt_b', 'opt_c'])[(n % 3 + pos) % 3 + 1] AS label
            FROM p, generate_series(0, 2) AS g(pos)
        """,
        "pairwise_counts": f"""
            WITH p AS (
                SELECT doc_id, length({_RANK_PROMPT}) % 3 AS k FROM documents
            ),
            pairs AS (
                SELECT (['opt_a', 'opt_b', 'opt_c'])[(k + i) % 3 + 1] AS winner,
                       (['opt_a', 'opt_b', 'opt_c'])[(k + j) % 3 + 1] AS loser
                FROM p, generate_series(0, 2) AS gi(i), generate_series(0, 2) AS gj(j)
                WHERE i < j
            )
            SELECT winner, loser, count(*) AS wins, CAST(0 AS BIGINT) AS ties
            FROM pairs GROUP BY winner, loser
        """,
        "embed": """
            WITH p AS (
                SELECT doc_id, length(coalesce(CAST(text AS VARCHAR), '')) AS n
                FROM documents
            )
            SELECT doc_id,
                   CAST((n * 31) % 97 AS DOUBLE) / 97 AS v0,
                   round((SELECT sum(CAST((p.n * 31 + i * 17) % 97 AS DOUBLE) / 97)
                          FROM generate_series(0, 7) AS g(i)), 6) AS vsum
            FROM p
        """,
        "positional_zip": "SELECT doc_id, n_chars FROM documents",
        "csv_scan": """
            SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey, n_name,
                   CAST(n_regionkey AS BIGINT) AS n_regionkey
            FROM nation
        """,
        "tpch_q1": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 2) AS sum_qty,
                   round(sum(l_extendedprice), 2) AS sum_base_price,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
                   count(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
            GROUP BY l_returnflag, l_linestatus
        """,
        "top_orders": """
            SELECT o_orderkey,
                   strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS created,
                   printf('$%.5f', coalesce(o_totalprice, 0.0)) AS cost,
                   coalesce(o_orderpriority, '') AS priority
            FROM orders
            WHERE o_orderdate IS NOT NULL
            ORDER BY o_orderdate DESC, o_orderkey DESC
            LIMIT 25
        """,
    }
