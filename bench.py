"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric", "value" (total sec), "unit", "queries", "sf"}.

Each query is forced end-to-end with the noop sink (no driver collect,
no count() shortcuts that would let Catalyst skip projection work).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "flagship_extract",
    "classify",
    "score",
    "embed",
    "batch_function",
    "exact_dedup",
    "ngram_jaccard",
    "minhash_lsh",
    "simhash",
    "text_profile",
    "similarity_topk",
    "embedding_dedup",
    "ivf_dedup",
    "multimodal_decode",
    "tpch_q1",
    "tpch_q3",
    "tpch_q6",
    "top_orders",
    "events_window",
    "events_sessionize",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    import __spark_entry__ as entrymod
    from sutro_spark.session import get_spark

    spark = get_spark("bench")
    qs = entrymod.queries()

    # warm the JVM/session so the first query doesn't pay startup cost
    spark.read.parquet(f"{sf_dir}/region.parquet").count()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = qs[name]
        t0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.time() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
