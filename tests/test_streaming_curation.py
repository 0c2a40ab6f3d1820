"""Composed streaming curation (bloom decon -> near-dup probe ->
quality -> mixture) == batch replay built from the INDEPENDENT batch
operators — the end-to-end shape that actually ships, not each stage
in isolation. Parametrized over the flat-parquet and bucketed
managed-table index layouts (same verdicts either way), plus the
at-least-once replay contract and the no-reshuffle plan shape the
bucketed layout exists for."""

import os

import pytest
from pyspark.sql import functions as F

SCHEMA = "doc_id long, text string, source string, lang string"

BASE = (
    "the quick brown fox jumps over the lazy dog and then it runs away "
    "into the deep green forest where nobody ever goes at night"
)
ALT = (
    "completely different content about spark structured streaming and "
    "the many joys of distributed state management in modern engines"
)
BENCH = (
    "every benchmark sentence must be long enough to carry several "
    "seven word grams for the bloom filter to catch verbatim reuse"
)

# relaxed Gopher gates sized for these short synthetic docs: only the
# junk doc (2 words, no stopwords) should fail
RULES = {"min_words": 5, "min_stop_hits": 1, "min_alpha_word_frac": 0.5}

BATCHES = [
    [(1, BASE, "web", "en"), (2, ALT, "web", "en")],
    [
        (3, BASE + " and then some", "books", "en"),  # near-dup of 1
        (4, "a perfectly clean document about gardens and the weather today", "web", "de"),
        (5, "prefix words then " + BENCH + " then suffix", "web", "en"),  # contaminated
    ],
    [
        (6, BASE, "books", "en"),  # exact dup of 1
        (7, "junk junk", "web", "en"),  # fails quality
        (8, "another clean and wholly original passage regarding the sea", "books", "de"),
    ],
]

KW = dict(k=8, threshold=0.1, max_df=100, n=7, bits_log2=13, hashes=3, quality_rules=RULES)


def _write_batches(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    for i, rows in enumerate(BATCHES):
        df = spark.createDataFrame(rows, SCHEMA)
        df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / f"b{i}"))
        part = next(
            p for p in os.listdir(tmp_path / f"b{i}") if p.endswith(".parquet")
        )
        dst = src / f"{i}.parquet"
        os.rename(tmp_path / f"b{i}" / part, dst)
        os.utime(dst, (1_700_000_000 + i, 1_700_000_000 + i))
    return src


@pytest.mark.parametrize("layout", ["flat", "bucketed"])
def test_streaming_curation_equals_batch_replay(spark, tmp_path, layout):
    from sutro_spark.operators.decontaminate import (
        bloom_bitset,
        bloom_contamination_flags,
    )
    from sutro_spark.operators.dedup import incremental_jaccard_pairs
    from sutro_spark.operators.quality import gopher_quality
    from sutro_spark.functions.text import token_count
    from sutro_spark.streaming.curation import current_mixture, streaming_curation

    bench_df = spark.createDataFrame([(100, BENCH)], "doc_id long, text string")
    words = bloom_bitset(bench_df, n=7, bits_log2=13, hashes=3)

    src = _write_batches(spark, tmp_path)
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    out_dir = str(tmp_path / "out")
    kw = dict(KW)
    if layout == "bucketed":
        kw.update(index_buckets=4, index_table_prefix="curation_eq_test")
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    try:
        q = (
            streaming_curation(
                stream, words, str(tmp_path / "index"), out_dir, **kw
            )
            .trigger(availableNow=True)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .start()
        )
        q.awaitTermination(180)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
        if layout == "bucketed":
            spark.sql("DROP TABLE IF EXISTS curation_eq_test_postings")
            spark.sql("DROP TABLE IF EXISTS curation_eq_test_dfs")

    got_docs = {
        r.doc_id: (r.maybe_contaminated, r.keep, r.has_near_dup, r.survived)
        for r in spark.read.parquet(f"{out_dir}/docs").collect()
    }
    got_pairs = {
        (r.corpus_id, r.new_id, round(r.jaccard, 9))
        for r in spark.read.parquet(f"{out_dir}/pairs").collect()
    }
    got_mix = {
        (r.source, r.lang): (r.n_docs, r.n_tokens)
        for r in current_mixture(spark, out_dir).collect()
    }

    # ---- batch replay from the independent operators ----------------
    exp_pairs = set()
    dup_ids = set()
    for t in range(1, len(BATCHES)):
        corpus = spark.createDataFrame(
            [r[:2] for b in BATCHES[:t] for r in b], "doc_id long, text string"
        )
        new = spark.createDataFrame(
            [r[:2] for r in BATCHES[t]], "doc_id long, text string"
        )
        for r in incremental_jaccard_pairs(corpus, new, k=8, threshold=0.1).collect():
            exp_pairs.add((r.corpus_id, r.new_id, round(r.jaccard, 9)))
            dup_ids.add(r.new_id)
    assert got_pairs == exp_pairs

    all_docs = spark.createDataFrame([r for b in BATCHES for r in b], SCHEMA)
    flags = {
        r["doc_id"]: r["__maybe_contaminated"]
        for r in bloom_contamination_flags(
            all_docs, words, n=7, bits_log2=13, hashes=3
        )
        .select("doc_id", F.col("`__maybe_contaminated`"))
        .collect()
    }
    keeps = {
        r.doc_id: r.keep
        for r in gopher_quality(all_docs, rules=RULES)
        .select("doc_id", "keep")
        .collect()
    }
    exp_docs = {
        d: (flags[d], keeps[d], int(d in dup_ids),
            int(flags[d] == 0 and keeps[d] == 1 and d not in dup_ids))
        for d in flags
    }
    assert got_docs == exp_docs

    toks = {
        r.doc_id: r.t
        for r in all_docs.select(
            "doc_id", token_count(F.col("text")).alias("t")
        ).collect()
    }
    exp_mix: dict = {}
    for b in BATCHES:
        for d, _txt, source, lang in b:
            if exp_docs[d][3]:
                n, tk = exp_mix.get((source, lang), (0, 0))
                exp_mix[(source, lang)] = (n + 1, tk + toks[d])
    assert got_mix == exp_mix

    # the scenario really exercised every gate
    assert got_docs[5][0] == 1          # bloom caught the benchmark reuse
    assert got_docs[7][1] == 0          # quality rejected the junk doc
    assert got_docs[3][2] == 1 and got_docs[6][2] == 1  # near-dups flagged
    assert got_docs[1][3] == 1          # first arrival survives
    survivors = [d for d, v in got_docs.items() if v[3]]
    assert 6 not in survivors and 5 not in survivors and 7 not in survivors


def _snapshot(spark, out_dir, index_dir, post_table=None, dfs_table=None):
    """Full content of all five sinks, order-independent."""
    docs = sorted(
        (r["doc_id"], r["maybe_contaminated"], r["keep"], r["has_near_dup"],
         r["survived"])
        for r in spark.read.parquet(f"{out_dir}/docs").collect()
    )
    pairs = sorted(
        (r["corpus_id"], r["new_id"], round(r["jaccard"], 9))
        for r in spark.read.parquet(f"{out_dir}/pairs").collect()
    )
    from sutro_spark.streaming.curation import current_mixture

    mix = sorted(
        (r["source"], r["lang"], r["n_docs"], r["n_tokens"])
        for r in current_mixture(spark, out_dir).collect()
    )
    if post_table:
        postings = sorted(
            (r["shingle"], r["id"])
            for r in spark.table(post_table).select("shingle", "id").collect()
        )
        dfs = sorted(
            (r["shingle"], r["df"])
            for r in spark.table(dfs_table)
            .groupBy("shingle").agg(F.sum("df").alias("df")).collect()
        )
    else:
        postings = sorted(
            (r["shingle"], r["id"])
            for r in spark.read.parquet(f"{index_dir}/postings")
            .select("shingle", "id").collect()
        )
        dfs = sorted(
            (r["shingle"], r["df"])
            for r in spark.read.parquet(f"{index_dir}/dfs")
            .groupBy("shingle").agg(F.sum("df").alias("df")).collect()
        )
    return docs, pairs, mix, postings, dfs


@pytest.mark.parametrize("layout", ["flat", "bucketed"])
def test_curation_replay_is_idempotent(spark, tmp_path, layout):
    """foreachBatch is at-least-once: re-delivering a micro-batch whose
    writes already committed must leave every sink (docs, pairs,
    mixture, postings, dfs) exactly as a single delivery would — no
    duplicated pairs, no inflated dfs, no double-counted mixture."""
    from sutro_spark.operators.decontaminate import bloom_bitset
    from sutro_spark.streaming.curation import curate_and_write

    bench_df = spark.createDataFrame([(100, BENCH)], "doc_id long, text string")
    words = bloom_bitset(bench_df, n=7, bits_log2=13, hashes=3)
    index_dir = str(tmp_path / "index")
    out_dir = str(tmp_path / "out")
    kw = dict(KW)
    post_table = dfs_table = None
    if layout == "bucketed":
        kw.update(index_buckets=4, index_table_prefix="curation_replay_test")
        post_table = "curation_replay_test_postings"
        dfs_table = "curation_replay_test_dfs"
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    try:
        b0 = spark.createDataFrame(BATCHES[0], SCHEMA)
        b1 = spark.createDataFrame(BATCHES[1], SCHEMA)
        curate_and_write(b0, 0, words, index_dir, out_dir, **kw)
        curate_and_write(b1, 1, words, index_dir, out_dir, **kw)
        once = _snapshot(spark, out_dir, index_dir, post_table, dfs_table)
        assert once[1], "scenario must produce at least one near-dup pair"
        # replay batch 1 (same data, same batch_id) — a retried trigger
        curate_and_write(b1, 1, words, index_dir, out_dir, **kw)
        replayed = _snapshot(spark, out_dir, index_dir, post_table, dfs_table)
        assert replayed == once
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
        if layout == "bucketed":
            spark.sql("DROP TABLE IF EXISTS curation_replay_test_postings")
            spark.sql("DROP TABLE IF EXISTS curation_replay_test_dfs")


def test_composed_probe_bucketed_index_never_reshuffled(spark, tmp_path):
    """The 100-TB claim for the COMPOSED pipeline: with the bucketed
    layout, the per-batch probe reads the accumulated postings/dfs
    index co-located (every index scan is 'Bucketed: true', the planner
    never falls back) and the probe plan carries strictly fewer
    shuffles than the identical-content flat layout, which must
    re-exchange the index sides every micro-batch. Exercises exactly
    the composed path's machinery: the __batch_id-pruned index readers
    plus probe_pairs, on an index built by curate_and_write."""
    from sutro_spark.operators.dedup import char_shingles
    from sutro_spark.operators.decontaminate import bloom_bitset
    from sutro_spark.streaming.curation import curate_and_write
    from sutro_spark.streaming.dedup import (
        _read_or_empty,
        _read_table_or_empty,
        probe_pairs,
    )

    bench_df = spark.createDataFrame([(100, BENCH)], "doc_id long, text string")
    words = bloom_bitset(bench_df, n=7, bits_log2=13, hashes=3)
    kw_b = dict(KW, index_buckets=4, index_table_prefix="curation_plan_test")
    b0 = spark.createDataFrame(BATCHES[0], SCHEMA)
    b1 = spark.createDataFrame(BATCHES[1], SCHEMA)
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        # == bucket count: the co-location contract curate_batch
        # enforces internally via _bucket_parallelism — a mismatched
        # session parallelism makes the planner re-exchange the index
        # side instead of reusing its bucketing
        "spark.sql.shuffle.partitions": "4",
    }
    prev = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k_, v in confs.items():
            spark.conf.set(k_, v)
        # both layouts, identical content (batches 0 and 1)
        curate_and_write(b0, 0, words, str(tmp_path / "ib"),
                         str(tmp_path / "ob"), **kw_b)
        curate_and_write(b1, 1, words, str(tmp_path / "ib"),
                         str(tmp_path / "ob"), **kw_b)
        curate_and_write(b0, 0, words, str(tmp_path / "if"),
                         str(tmp_path / "of"), **KW)
        curate_and_write(b1, 1, words, str(tmp_path / "if"),
                         str(tmp_path / "of"), **KW)

        probe = char_shingles(
            spark.createDataFrame(BATCHES[2], SCHEMA), "text", "doc_id", 8
        )

        def pair_plan(postings, dfs):
            pairs, _ = probe_pairs(
                probe, postings, dfs, threshold=0.1, max_df=100
            )
            return pairs._jdf.queryExecution().executedPlan().toString()

        plan_b = pair_plan(
            _read_table_or_empty(
                spark, "curation_plan_test_postings",
                "shingle string, id long", before_batch=2,
            ),
            _read_table_or_empty(
                spark, "curation_plan_test_dfs",
                "shingle string, df long", before_batch=2,
            ),
        )
        plan_f = pair_plan(
            _read_or_empty(
                spark, str(tmp_path / "if" / "postings"),
                "shingle string, id long", before_batch=2,
            ),
            _read_or_empty(
                spark, str(tmp_path / "if" / "dfs"),
                "shingle string, df long", before_batch=2,
            ),
        )
        # every shingle-keyed index access reads co-located buckets: the
        # postings probe scan and the dfs rollup scan (>=2 bucketed
        # scans). The ONE allowed non-bucketed index scan is the
        # corpus-size lookup, which joins postings on id — bucketing by
        # shingle can't serve an id join; production relies on
        # broadcasting the tiny matched-ids side there instead.
        assert plan_b.count("Bucketed: true") >= 2, plan_b
        assert plan_b.count("Bucketed: false") <= 1, plan_b
        sh_b = plan_b.count("Exchange") - plan_b.count("BroadcastExchange")
        sh_f = plan_f.count("Exchange") - plan_f.count("BroadcastExchange")
        assert sh_b < sh_f, (sh_b, sh_f)
    finally:
        for k_, v in prev.items():
            if v is not None:
                spark.conf.set(k_, v)
        spark.sql("DROP TABLE IF EXISTS curation_plan_test_postings")
        spark.sql("DROP TABLE IF EXISTS curation_plan_test_dfs")
