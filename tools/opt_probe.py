"""Optimization-round measurement probe (guide §1): time individual
queries end-to-end through the noop sink inside ONE session, several
passes each, and optionally dump .explain("formatted") to a directory.

Unlike bench.py this is a scalpel: pick the queries, pick the passes,
get per-pass wall times + min, with jobs labelled for the UI. Never
used by the driver; exists so before/after numbers in
OPTIMIZATION_r16.md come from isolated, repeatable measurements.

Usage:
  python tools/opt_probe.py [--passes N] [--sf DIR] [--plans OUTDIR] q1 q2 ...
  python tools/opt_probe.py --headline            # the 20 bench queries
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HEADLINE = [
    "flagship_extract", "classify", "score", "embed", "batch_function",
    "exact_dedup", "ngram_jaccard", "minhash_lsh", "simhash", "text_profile",
    "similarity_topk", "embedding_dedup", "ivf_dedup", "multimodal_decode",
    "tpch_q1", "tpch_q3", "tpch_q6", "top_orders", "events_window",
    "events_sessionize",
]


def main() -> None:
    args = sys.argv[1:]
    passes = 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    plans_dir = None
    names: list[str] = []
    i = 0
    while i < len(args):
        a = args[i]
        if a == "--passes":
            passes = int(args[i + 1]); i += 2
        elif a == "--sf":
            sf_dir = args[i + 1]; i += 2
        elif a == "--plans":
            plans_dir = args[i + 1]; i += 2
        elif a == "--headline":
            names.extend(HEADLINE); i += 1
        else:
            names.append(a); i += 1

    import __spark_entry__ as entrymod
    from sutro_spark.session import get_spark

    spark = get_spark("opt_probe")
    qs = entrymod.queries()

    # same warm-up as bench.py so first-query numbers are comparable
    from pyspark.sql import functions as F

    r = spark.read.parquet(f"{sf_dir}/region.parquet")
    n = spark.read.parquet(f"{sf_dir}/nation.parquet")
    (
        n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(F.count(F.lit(1)), F.min(F.sha2(F.col("n_name"), 256)))
        .write.format("noop").mode("overwrite").save()
    )
    import pandas as _pd

    def _warm(batches):
        for b in batches:
            yield _pd.DataFrame({"x": b["r_regionkey"].astype("int64")})

    r.mapInPandas(_warm, "x long").write.format("noop").mode("overwrite").save()

    if plans_dir:
        os.makedirs(plans_dir, exist_ok=True)

    out: dict[str, dict] = {}
    for _ in range(passes):
        for name in names:
            if name not in qs:
                out.setdefault(name, {"error": "unknown query"})
                continue
            spark.sparkContext.setJobDescription(f"opt_probe:{name}")
            t0 = time.time()
            try:
                qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
                dt = time.time() - t0
            except Exception as exc:  # noqa: BLE001
                out.setdefault(name, {}).setdefault("error", f"{type(exc).__name__}: {exc}"[:300])
                continue
            finally:
                spark.sparkContext.setJobDescription(None)
                spark.catalog.clearCache()
            rec = out.setdefault(name, {"passes": []})
            rec.setdefault("passes", []).append(round(dt, 3))
    for name, rec in out.items():
        if rec.get("passes"):
            rec["min"] = min(rec["passes"])
    if plans_dir:
        for name in names:
            if name in qs:
                try:
                    plan = qs[name](spark, sf_dir)._jdf.queryExecution().explainString(
                        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
                    )
                    with open(os.path.join(plans_dir, f"{name}.txt"), "w") as fh:
                        fh.write(plan)
                except Exception as exc:  # noqa: BLE001
                    out.setdefault(name, {}).setdefault(
                        "plan_error", f"{type(exc).__name__}: {exc}"[:300]
                    )
    total = round(sum(r["min"] for r in out.values() if "min" in r), 3)
    print(json.dumps({"sf_dir": sf_dir, "passes": passes, "total_min_sum": total,
                      "queries": out}, sort_keys=True))


if __name__ == "__main__":
    main()
