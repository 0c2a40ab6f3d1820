"""Composed streaming curation (bloom decon -> near-dup probe ->
quality -> mixture) == batch replay built from the INDEPENDENT batch
operators — the end-to-end shape that actually ships, not each stage
in isolation."""

import os

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


def test_streaming_curation_equals_batch_replay(spark, tmp_path):
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
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    try:
        q = (
            streaming_curation(
                stream, words, str(tmp_path / "index"), out_dir, **KW
            )
            .trigger(availableNow=True)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .start()
        )
        q.awaitTermination(180)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)

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
