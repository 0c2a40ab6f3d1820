"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE final JSON line: {"metric", "value" (total sec), "unit",
"queries", "sf"} — preceded by one self-contained "bench_detail" JSON
line carrying the per-pass raw timings / extra-query timings /
ann_probes (moved off the contract line in r17 so the final line
always fits the driver's stdout-tail archive; see OPTIMIZATION_r17.md).

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


def _cpu_jiffies() -> tuple[int, int] | None:
    """(steal, total) jiffies from /proc/stat's aggregate cpu line, or
    None where unavailable. The delta over the benchmark quantifies how
    much hypervisor CPU-steal polluted this run — the documented host
    noise (multi-minute ~17% steal bursts, ARCHITECTURE.md) — so
    cross-round comparisons can be auto-qualified from the artifact
    itself instead of re-litigating noise each round."""
    try:
        with open("/proc/stat") as fh:
            parts = fh.readline().split()
        if parts[0] != "cpu":
            return None
        vals = [int(x) for x in parts[1:]]
        steal = vals[7] if len(vals) > 7 else 0
        return steal, sum(vals)
    except (OSError, ValueError, IndexError):
        return None


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    import __spark_entry__ as entrymod
    from sutro_spark.session import get_spark

    spark = get_spark("bench")
    qs = entrymod.queries()

    # Warm the JVM: a scan, a shuffle agg, a broadcast join, and a sha2
    # expression touch the codegen/shuffle paths the headline queries
    # use, so the first measured query isn't paying one-time JIT cost.
    from pyspark.sql import functions as F

    r = spark.read.parquet(f"{sf_dir}/region.parquet")
    n = spark.read.parquet(f"{sf_dir}/nation.parquet")
    (
        n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(F.count(F.lit(1)), F.min(F.sha2(F.col("n_name"), 256)))
        .write.format("noop").mode("overwrite").save()
    )
    # ... and the Python/Arrow path: spawning the Python workers and
    # initialising Arrow serialization is a one-time session cost that
    # otherwise lands entirely on whichever mapInPandas query runs
    # first (measured ~7 s attributed to flagship_extract for work that
    # is really session startup, not engine cost).
    import pandas as _pd

    def _warm(batches):
        for b in batches:
            yield _pd.DataFrame({"x": b["r_regionkey"].astype("int64")})

    r.mapInPandas(_warm, "x long").write.format("noop").mode("overwrite").save()

    errors: dict[str, str] = {}
    jiffies_start = _cpu_jiffies()
    try:
        load_at_start = [round(x, 2) for x in os.getloadavg()]
    except OSError:
        load_at_start = None

    def run_once(name: str) -> float | None:
        """One end-to-end run. clearCache afterwards drops intermediates
        persisted inside operators (row-id minting caches its
        range-partitioned input) so storage-memory pressure from one run
        can't tax the next. A failing query is recorded in `errors` and
        excluded from the total instead of aborting the whole benchmark —
        one red query must never zero out the other timings."""
        t0 = time.time()
        try:
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        except Exception as exc:  # noqa: BLE001 — report, don't abort
            errors[name] = f"{type(exc).__name__}: {exc}"[:400]
            return None
        spark.catalog.clearCache()
        return time.time() - t0

    def timed_set(
        names: list[str], passes: int = 2
    ) -> tuple[dict[str, float], list[dict[str, float]], list[float | None]]:
        """min over ``passes`` INTERLEAVED passes: the host VM sees
        multi-minute CPU-steal bursts (round 4 measured ~17% steal in
        /proc/stat with 5x spread between repeat runs of the same
        query) that would cover both runs of a back-to-back min-of-2;
        running the whole set repeatedly spaces each query's runs
        minutes apart so at least one usually lands outside the burst.
        The min is the honest engine cost.

        Also returns every pass's raw per-query timings plus each
        pass's measured steal%: a uniform cross-round shift (like r7's
        +19%) is then adjudicable from the artifact alone — uniform
        spread across passes + elevated steal = host noise; a
        consistent per-query delta across LOW-steal passes = a real
        regression."""
        best: dict[str, float] = {}
        per_pass: list[dict[str, float]] = []
        pass_steal: list[float | None] = []
        pass_load: list[float | None] = []
        for _ in range(passes):
            try:
                pass_load.append(round(os.getloadavg()[0], 2))
            except OSError:
                pass_load.append(None)
            j0 = _cpu_jiffies()
            cur: dict[str, float] = {}
            for name in names:
                if name in errors:
                    continue
                t = run_once(name)
                if t is not None:
                    cur[name] = round(t, 3)
                    best[name] = min(best.get(name, float("inf")), t)
            j1 = _cpu_jiffies()
            per_pass.append(cur)
            pass_steal.append(
                round(100.0 * (j1[0] - j0[0]) / (j1[1] - j0[1]), 2)
                if j0 and j1 and j1[1] > j0[1]
                else None
            )
        return (
            {k: round(v, 3) for k, v in best.items() if k not in errors},
            per_pass,
            pass_steal,
            pass_load,
        )

    # the headline total is the cross-round comparison number — worth
    # extra passes: r8's per-pass instrumentation showed pass totals
    # still declining monotonically at pass 3 (30.0 -> 24.3 -> 19.4 s
    # at <0.2% steal — JIT/page-cache warm-up, not host noise), so
    # min-of-3 had not converged; a 4th pass costs ~20 s and lets the
    # min come from a genuinely warm pass.
    timings, headline_passes, headline_steal, headline_load = timed_set(
        [n for n in HEADLINE if n in qs], passes=4
    )
    # a red headline query invalidates the total — a partial sum would
    # make the run look FASTER than a complete one; null it instead so
    # consumers comparing `value` across rounds can't be misled
    headline_complete = not (set(HEADLINE) & set(errors))
    total = round(sum(timings.values()), 3) if headline_complete else None

    # Round-2+ additions, timed separately so `value` stays comparable
    # with BENCH_r01's 20-query headline total.
    # Retired r8 (COVERAGE.md decision log): rank_elo_large (21.5 s/run
    # scale probe; evidence recorded in SCALING.md, operators proven by
    # pairwise_counts + rank_elo) and dedup_agreement (9.8 s/run
    # agreement probe; the three dedup families stay individually
    # benched via ngram_jaccard / minhash_lsh / simhash).
    # Retired r10 (decision log): dup_clusters (winnow_dedup runs the
    # same pairs→CC→representative composition and stays benched).
    extra, extra_passes, extra_steal, extra_load = timed_set(
        [
            name
            for name in [
            "rh_lsh_dedup", "chunk_docs", "redact_pii", "hash_sample_split",
            "tpch_q4ish", "tpch_q10ish", "tpch_q12ish", "decontaminate",
            "gopher_quality", "quality_scorer",
            "term_topk", "source_mix", "cap_per_source",
            "reassemble_chunks", "label_centroids", "price_quantiles",
            "tpch_q18ish", "tpch_q22ish", "events_props_stats",
            "pack_contexts", "pack_chunks", "shard_manifest",
            "stratified_sample", "quality_percentile", "kmeans_clusters",
            "semdedup", "strip_boilerplate", "url_profile",
            "tpch_q7ish", "tpch_q17ish",
            "tpch_q2ish", "tpch_q8ish", "tpch_q9ish", "tpch_q11ish",
            "tpch_q13ish", "tpch_q15ish", "tpch_q16ish", "tpch_q19ish",
            "tpch_q20ish", "tpch_q21ish", "events_rolling",
            "length_histogram", "eval_report", "repetition_profile",
            "pagerank_suppliers", "tfidf_topk", "word_bigrams",
            "domain_split", "dedup_keep_best", "eval_kappa",
            "merge_upsert", "gap_fill", "funnel", "retention",
            "fuzzy_join_names", "weighted_sample",
            "winsorize_prices", "zscore_outliers", "cube_counts",
            "kmv_distinct", "weighted_sample_group", "shuffled_shards",
            "asof_forward", "event_transitions", "jsonl_scan", "temperature_mix",
            "snapshot_diff", "dedup_lines", "fuzzy_decontaminate", "video_frames",
            "token_budget", "epoch_plan", "embedding_norms", "embedding_anisotropy", "center_embeddings", "pca_direction", "remove_direction", "hits", "communities", "dup_size_histogram",
            "winnow_overlap", "winnow_recall", "exact_substr_spans",
            "exact_substr_strip", "contaminated_spans",
            "dsir_select", "charlm_quality", "dedup_paragraphs", "sq_topk",
            "dup_passages", "strip_passages", "hll_distinct",
            "hll_merge", "sentence_stats", "nfc_check", "winnow_dedup",
            "quality_train", "quality_train_eval",
            "pq_codes", "pq_topk", "pq_recall", "ivfpq_topk", "zorder_key", "bloom_decontaminate",
            "bpe_merges", "bpe_vocab", "cms_heavy_hitters", "source_overlap", "jaccard_histogram", "lsh_recall", "sq_recall", "leakage_safe_split", "validate_orders", "bigram_lift", "ivf_recall", "length_gini", "price_histogram_quantiles", "skew_report", "sql_interface", "time_split", "curation_pipeline_v2", "lang_confidence", "ols_tokens_vs_chars", "table_profile", "corr_tokens_chars", "mixture_drift",
            "ann_mrr", "calibration", "classify_calibration", "ece",
            "keyword_flags", "rollup_incr", "ivfpq_residual",
            "ivfpq_recall", "ivfpq_prune", "image_dhash", "dhash_pairs",
            "bm25_topk", "pagerank", "image_whash", "pagerank_redistribute",
            "salted_join", "two_phase_agg", "hybrid_retrieval",
            "mmr_rerank", "hard_negatives", "kmv_join_est", "cdc_chunks", "cdc_dedup", "mad_outliers", "sorted_neighborhood", "histogram_drift", "label_propagate", "precision_threshold", "kmv_merge", "length_buckets", "ngram_novelty", "containment", "fleiss_kappa", "vocab_richness",
            "yule_k", "unigram_surprisal", "krippendorff_alpha", "scd2_history",
            "copurchase_triangles", "kmv_set_ops", "jl_project", "kcore", "prefix_filter", "hamilton_sample", "readability", "ann_map", "quantile_normalize", "attribution", "benford", "incremental_cc", "json_keys", "bpe_encode", "hll_set_ops",
            # r12 wave (representatives; the fixpoints are scale-probed
            # in SCALING.md and too heavy for a per-round extra pass)
            "ffd_pack", "mg_heavy_hitters", "pass_at_k", "majority_vote",
            "weighted_jaccard", "wordpiece_segment", "encoding_damage",
            "script_profile", "ivfpq_rescore",
            # r13 wave
            "unigram_segment", "script_gate", "ndcg", "qdigest_quantiles",
            "luhn_cards",
            ]
            if name in qs
        ]
    )

    # ANN evidence probes (bench extras, not [Q]s — VERDICT r7 #7/#9):
    # (a) production-shaped IVFADC recall: the oracle-sized [Q] runs
    #     n_codes=16 (recall 0.16, honest but unconvincing); this probe
    #     reports recall@10 at n_codes=256 + 4 coarse rounds on the
    #     real sf embeddings table — the number a capability claim can
    #     carry.
    # (b) pruning saving on CLUSTERED data: the uniform synthetic table
    #     never lets the per-bucket lower bound beat tau, so the [Q]
    #     proves only the arithmetic; this probe measures the actual
    #     ADC-candidate reduction (cand_pruned < cand_full) at equal
    #     top-k output on separable vectors (test_pq.py fixture shape).
    ann_probes: dict = {}
    try:
        from sutro_spark.operators.metrics import candidate_recall
        from sutro_spark.operators.pq import exact_l2_topk, ivfpq_residual_topk

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        nq = 50
        queries = emb.where(F.col("vec_id") < nq)
        # materialize the exact baseline BEFORE the timers (ADVICE r10:
        # a lazy `exact` was re-evaluated inside every timed probe,
        # inflating each nprobe's sec by a constant that dwarfed the
        # small-nprobe differences the sweep exists to record)
        exact = exact_l2_topk(emb, queries, k=10).persist()
        exact.count()
        # unpersist in a finally (ADVICE r11): a probe raising mid-sweep
        # must not leave the exact baseline cached for the rest of the
        # bench run, where it would skew every later timing
        try:
            # nprobe SWEEP to saturation (VERDICT r10 #4): coarse_k=32
            # buckets, nprobe 2..32 — the 32 point scans every bucket, so
            # recall there is the ceiling of THIS index (PQ quantization
            # loss only); where the curve flattens below 32 is the knob a
            # user sizing an index reads off.
            sweep = {}
            for nprobe in (2, 4, 8, 16, 32):
                t0 = time.time()
                approx = ivfpq_residual_topk(
                    emb, queries, k=10, n_codes=256, coarse_k=32,
                    coarse_iters=4, nprobe=nprobe,
                )
                row = candidate_recall(
                    exact, approx, keys=("query_id", "neighbor_id")
                ).first()
                sweep[f"nprobe_{nprobe}"] = {
                    "recall_at_10": round(row["recall"], 4) if row["recall"] is not None else None,
                    "sec": round(time.time() - t0, 3),
                }
            # one higher-coarse-iters point: same nprobe as the knee,
            # twice the Lloyd rounds — separates coarse-quantizer quality
            # from probe breadth as the recall limiter
            t0 = time.time()
            approx = ivfpq_residual_topk(
                emb, queries, k=10, n_codes=256, coarse_k=32,
                coarse_iters=8, nprobe=8,
            )
            row = candidate_recall(
                exact, approx, keys=("query_id", "neighbor_id")
            ).first()
            sweep["nprobe_8_iters_8"] = {
                "recall_at_10": round(row["recall"], 4) if row["recall"] is not None else None,
                "sec": round(time.time() - t0, 3),
            }
            # r12: exact-rescore refinement — the lever the r11
            # saturation note named. ADC shortlist (rescore_k) joins
            # back the raw vectors for JUST those ids and re-ranks by
            # exact L2; recall vs the nprobe_16 row above is the
            # quantization loss the rescore buys back, at O(q*c) cost.
            # r13 (VERDICT #3): the single r12 point becomes a
            # rescore_k SWEEP so a user tuning recall/latency has a
            # frontier, not one point to extrapolate from — where THIS
            # curve flattens is the residual codebook/rotation loss
            # (the next lever: OPQ-lite, see SCALING.md).
            for rk in (25, 50, 100, 200):
                t0 = time.time()
                approx = ivfpq_residual_topk(
                    emb, queries, k=10, n_codes=256, coarse_k=32,
                    coarse_iters=4, nprobe=16, rescore_k=rk,
                )
                row = candidate_recall(
                    exact, approx, keys=("query_id", "neighbor_id")
                ).first()
                sweep[f"nprobe_16_rescore_{rk}"] = {
                    "recall_at_10": round(row["recall"], 4) if row["recall"] is not None else None,
                    "sec": round(time.time() - t0, 3),
                }
        finally:
            exact.unpersist()
        ann_probes["ivfpq_recall_prod"] = {
            "n_codes": 256, "coarse_k": 32, "coarse_iters": 4,
            "n_queries": nq, **sweep,
        }
    except Exception as exc:  # noqa: BLE001
        errors["ivfpq_recall_prod"] = f"{type(exc).__name__}: {exc}"[:400]
    try:
        from sutro_spark.operators.pq import (
            ivfpq_prune_stats,
            ivfpq_pruned_topk,
            ivfpq_residual_topk,
        )

        n, dim, g = 4096, 64, 8
        rows = []
        for i in range(n):
            c = i % g
            rows.append(
                (i, [0.9 if (d % g) == c else 0.05 * ((i * 7 + d) % 3)
                     for d in range(dim)])
            )
        clustered = spark.createDataFrame(
            rows, "vec_id long, embedding array<double>"
        )
        cqueries = clustered.where(F.col("vec_id") < 8)
        t0 = time.time()
        st = ivfpq_prune_stats(clustered, cqueries, k=3).first()
        full_res = sorted(
            (r["query_id"], r["rank"], r["neighbor_id"])
            for r in ivfpq_residual_topk(clustered, cqueries, k=3).collect()
        )
        pruned_res = sorted(
            (r["query_id"], r["rank"], r["neighbor_id"])
            for r in ivfpq_pruned_topk(clustered, cqueries, k=3).collect()
        )
        ann_probes["ivfpq_prune_clustered"] = {
            "cand_full": st["cand_full"],
            "cand_pruned": st["cand_pruned"],
            "reduction_pct": round(
                100.0 * (1 - st["cand_pruned"] / st["cand_full"]), 1
            ) if st["cand_full"] else None,
            "equal_topk": full_res == pruned_res,
            "n_vectors": n, "sec": round(time.time() - t0, 3),
        }
    except Exception as exc:  # noqa: BLE001
        errors["ivfpq_prune_clustered"] = f"{type(exc).__name__}: {exc}"[:400]

    # r16 (VERDICT r15 #3): the two newest ANN rungs — exhaustive BQ
    # and IVF-routed BQ — get per-round recall/latency rows so a
    # Hamming-path regression shows up in the BENCH trend, not only in
    # a one-time SCALING adjudication. Same corpus and k as
    # ivfpq_recall_prod, same coarse routing shape (coarse_k=32,
    # 4 Lloyd rounds), truth = brute-force COSINE (the metric BQ
    # rescores by — the bq_recall [Q] family's baseline). The
    # nprobe×rescore grid budgets the two knobs JOINTLY (the
    # shortlist-crowding caveat on ivf_bq_topk: at fixed rescore,
    # recall is non-monotone in nprobe); nprobe=32 scans every bucket
    # — the Hamming-proxy ceiling of this index.
    try:
        from sutro_spark.operators.metrics import candidate_recall
        from sutro_spark.operators.similarity import (
            bq_topk,
            brute_force_topk,
            ivf_bq_index,
            ivf_bq_topk,
        )

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        nq = 50
        queries = emb.where(F.col("vec_id") < nq)
        exactc = brute_force_topk(emb, queries, k=10).persist()
        exactc.count()
        # build the serving index ONCE (the ivf_bq_index call shape) so
        # grid points time QUERY cost, not a per-point quantizer
        # retrain; build_sec is reported on its own
        t0 = time.time()
        codes, cents, thr = ivf_bq_index(
            emb, coarse_k=32, coarse_iters=4
        )
        codes = codes.persist()
        codes.count()
        build_sec = round(time.time() - t0, 3)
        try:
            sweep = {}
            for rm in (4, 8):
                t0 = time.time()
                approx = bq_topk(emb, queries, k=10, rescore_multiple=rm)
                row = candidate_recall(
                    exactc, approx, keys=("query_id", "neighbor_id")
                ).first()
                sweep[f"bq_rescore_{rm}"] = {
                    "recall_at_10": round(row["recall"], 4)
                    if row["recall"] is not None
                    else None,
                    "sec": round(time.time() - t0, 3),
                }
            for nprobe, rm in ((2, 4), (4, 8), (8, 8), (32, 8)):
                t0 = time.time()
                approx = ivf_bq_topk(
                    emb, queries, k=10, nprobe=nprobe,
                    rescore_multiple=rm, index=(codes, cents, thr),
                )
                row = candidate_recall(
                    exactc, approx, keys=("query_id", "neighbor_id")
                ).first()
                sweep[f"ivf_bq_nprobe_{nprobe}_rescore_{rm}"] = {
                    "recall_at_10": round(row["recall"], 4)
                    if row["recall"] is not None
                    else None,
                    "sec": round(time.time() - t0, 3),
                }
        finally:
            exactc.unpersist()
            codes.unpersist()
        ann_probes["bq_recall_prod"] = {
            "dim": 64, "coarse_k": 32, "coarse_iters": 4,
            "n_queries": nq, "build_sec": build_sec, **sweep,
        }
    except Exception as exc:  # noqa: BLE001
        errors["bq_recall_prod"] = f"{type(exc).__name__}: {exc}"[:400]

    # Production-scale BPE probe (VERDICT r9 #5): encode the full sf
    # documents table under a >= 1k-merge FROZEN table via the Arrow
    # canonical encoder (bpe_apply engine=auto routes there past 256
    # merges). The merge table is trained driver-side on a bounded
    # corpus sample — exactly the deployment shape: tokenizer trained
    # elsewhere, engine applies it at corpus scale.
    try:
        import random
        from collections import Counter, defaultdict

        from sutro_spark.operators.bpe import bpe_apply

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        t0 = time.time()
        # the sf corpus has a ~31-word synthetic vocabulary — far too
        # small to LEARN 1k merges from. The realistic deployment shape
        # is a tokenizer trained on a DIFFERENT, richer corpus and
        # applied frozen, so train on the corpus sample plus a
        # deterministic Zipf-weighted letter-frequency vocabulary
        # (seeded — same table every bench run).
        sample = [
            r["text"] or ""
            for r in docs.select("text").where(F.col("doc_id") % 50 == 0).collect()
        ]
        wf = Counter(w for t in sample for w in t.split())
        rng = random.Random(10)
        letters = "etaoinshrdlucmfwypvbgkjqxz"
        lweights = list(range(len(letters), 0, -1))
        for i in range(3000):
            w = "".join(rng.choices(letters, weights=lweights, k=4 + i % 9))
            wf[w] += 3000 // (i + 1) + 1
        # incremental-pair-count BPE trainer (driver-side, bounded
        # vocab): per round only words containing the merged pair are
        # touched
        vocab = {w: list(w) for w in wf}
        pc: Counter = Counter()
        occ: defaultdict = defaultdict(set)
        for w, syms in vocab.items():
            fq = wf[w]
            for p in zip(syms, syms[1:]):
                pc[p] += fq
                occ[p].add(w)
        merges = []
        for _ in range(1024):
            if not pc:
                break
            best = max(pc.items(), key=lambda kv: (kv[1], kv[0]))
            if best[1] <= 0:
                break
            la, lb = best[0]
            merges.append((la, lb))
            merged = la + lb
            for w in list(occ.get((la, lb), ())):
                syms = vocab[w]
                fq = wf[w]
                for p in zip(syms, syms[1:]):
                    pc[p] -= fq
                out, i2 = [], 0
                while i2 < len(syms):
                    if i2 < len(syms) - 1 and syms[i2] == la and syms[i2 + 1] == lb:
                        out.append(merged)
                        i2 += 2
                    else:
                        out.append(syms[i2])
                        i2 += 1
                vocab[w] = out
                for p in zip(out, out[1:]):
                    pc[p] += fq
                    occ[p].add(w)
            occ.pop((la, lb), None)
            pc.pop((la, lb), None)
        train_sec = round(time.time() - t0, 3)
        t0 = time.time()
        enc = bpe_apply(docs, merges).agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_subwords").alias("n_subwords"),
            F.sum("n_words").alias("n_words"),
        ).first()
        ann_probes["bpe_encode_1k"] = {
            "n_merges": len(merges),
            "n_docs": enc["n_docs"],
            "subwords_per_word_milli": int(1000 * enc["n_subwords"] / enc["n_words"]) if enc["n_words"] else None,
            "train_sec_driver_sample": train_sec,
            "encode_sec": round(time.time() - t0, 3),
        }
    except Exception as exc:  # noqa: BLE001
        errors["bpe_encode_1k"] = f"{type(exc).__name__}: {exc}"[:400]

    # r13 (VERDICT #6): FFD seam-waste honesty sweep — blocked packing
    # bounds waste at <= 1 half-empty bin per group_size block; this
    # MEASURES per-mille fill at group_size 64/256/1024 so a user
    # sizing blocks sees what the bound costs in practice (larger
    # blocks amortize block-seam waste -> higher fill, at O(G^2)
    # per-task packing work; the [Q]'s bound_ok verdict rides along).
    try:
        from sutro_spark.operators.packing import ffd_pack, ffd_stats

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        fsw = {}
        for gs in (64, 256, 1024):
            t0 = time.time()
            st = ffd_stats(
                ffd_pack(docs, budget=96, group_size=gs), budget=96
            ).first()
            fsw[f"group_{gs}"] = {
                "fill_per_mille": st["fill_per_mille"],
                "n_bins": st["n_bins"],
                "lb_bins": st["lb_bins"],
                "bound_ok": st["bound_ok"],
                "sec": round(time.time() - t0, 3),
            }
        ann_probes["ffd_fill_sweep"] = {"budget": 96, **fsw}
    except Exception as exc:  # noqa: BLE001
        errors["ffd_fill_sweep"] = f"{type(exc).__name__}: {exc}"[:400]

    # BASELINE.md-promised metric: prefix-sample cost-estimate accuracy.
    # Ratio of the C6 sampled-prefix input-token estimate to the exact
    # full-scan token count over documents.text (1.0 = perfect).
    from sutro_spark.plans.cost import count_tokens, estimate_cost

    try:
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        est = estimate_cost(docs, "text")
        actual = count_tokens(docs, "text").agg(F.sum("__tokens").alias("t")).first()["t"]
        estimate_accuracy = round(est["input_tokens"] / actual, 4) if actual else None
    except Exception as exc:  # noqa: BLE001
        errors["estimate_accuracy"] = f"{type(exc).__name__}: {exc}"[:400]
        estimate_accuracy = None

    jiffies_end = _cpu_jiffies()
    steal_pct = None
    if jiffies_start and jiffies_end and jiffies_end[1] > jiffies_start[1]:
        steal_pct = round(
            100.0
            * (jiffies_end[0] - jiffies_start[0])
            / (jiffies_end[1] - jiffies_start[1]),
            2,
        )

    # TWO stdout lines (r17 fix, VERDICT r16 #1 — a measurement-REPORTING
    # bug, not a methodology change; every timing above is computed
    # exactly as before):
    #   line 1 — full detail (per-pass raw timings, extras, ann_probes,
    #            loadavgs). Printed FIRST because the driver archives
    #            only the TAIL of stdout; this line is expendable.
    #   line 2 — the compact contract line ({"metric", "value",
    #            "queries", "sf", ...}), printed LAST so the whole line
    #            always survives the driver's ~2 KB tail window. r15's
    #            single fat line (bloated past 4 KB by ann_probes) was
    #            truncated there before `"value"`, which broke
    #            PERF_r16's prev-vs-now parse (prev_bench_ok: false).
    # Nothing is removed from stdout — the detail keys that used to sit
    # on the one fat line all move to line 1 verbatim.
    print(
        json.dumps(
            {
                "metric": "bench_detail",
                "sf": sf,
                # per-pass raw data: full per-query timings of every
                # pass + per-pass steal%, so a cross-round shift is
                # adjudicable (uniform spread + high steal = host
                # noise; consistent delta at low steal = regression).
                "extra_passes": extra_passes,
                "extra_pass_steal_pct": extra_steal,
                "extra_queries": extra,
                "headline_passes": headline_passes,
                "headline_pass_steal_pct": headline_steal,
                # 1-min loadavg sampled as each pass STARTS (r11,
                # VERDICT #5): pins co-resident load per pass, not just
                # at run start — the noise source steal% can't see
                "headline_pass_loadavg": headline_load,
                "extra_pass_loadavg": extra_load,
                "ann_probes": ann_probes,
                "errors": errors,
            }
        )
    )
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_sec",
                "unit": "sec",
                "sf": sf,
                # methodology: full INTERLEAVED passes over each set,
                # min per query — spaces each query's runs minutes apart
                # so one host CPU-steal burst can't inflate both.
                # runs_per_query stays an int (the minimum across sets)
                # for r1-r3 artifact compatibility; the per-set detail
                # lives under runs_per_query_detail.
                "runs_per_query": 2,
                "runs_per_query_detail": {"headline": 4, "extra": 2},
                "agg": "min_interleaved",
                "queries": timings,
                "estimate_accuracy": estimate_accuracy,
                # errors keep their r1-r16 key/shape but messages are
                # capped hard here (full text on the detail line): many
                # long messages could push this line back past the tail
                # window the split exists to respect
                "errors": {k: v[:120] for k, v in errors.items()},
                "headline_complete": headline_complete,
                # measured hypervisor CPU steal over the whole run (%),
                # from /proc/stat — if this is high, per-query swings vs
                # other rounds are noise until proven otherwise. The
                # 1/5/15-min load averages at start catch the OTHER
                # noise source steal can't: co-resident processes on
                # the same VM competing for the 32 cores.
                "steal_pct": steal_pct,
                "loadavg_at_start": load_at_start,
                "value": total,
            }
        )
    )


if __name__ == "__main__":
    main()
