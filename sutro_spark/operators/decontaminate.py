"""Benchmark decontamination: drop (or flag) training documents that
share any word n-gram with an evaluation/benchmark set.

The standard pretraining hygiene step (13-gram overlap in GPT-3/PaLM
data cards): a train doc containing any n-gram that also appears in a
benchmark is "contaminated" and must be excluded so eval numbers stay
honest.

This module decides at DOCUMENT granularity (flag/drop the whole doc).
For the surgical variant — cut only the overlapping character spans
and keep each document's clean remainder — see
:func:`sutro_spark.operators.exact_substr.contaminated_spans` /
``strip_contaminated_spans`` (r11).

Scale shape — this is the one dedup-family op with an asymmetry you
must exploit: the benchmark side is TINY (eval suites are thousands of
documents; the train side is the 100 TB). So the plan is a **broadcast
semi-join on the gram**: distinct benchmark grams are collected into a
broadcast hash relation and the train corpus streams through map-side
— the train side is never shuffled, never collected, and scans with
full column pruning. Contrast ``incremental_jaccard_pairs`` (both
sides large → shuffle equi-join on shingle): use that shape if your
"benchmark" is actually another corpus.

At real scale, shrink the broadcast by joining on a 64-bit digest of
the gram (``xxhash64``) instead of the raw string — collisions only
*add* false contamination at ~2^-64 per pair, which is the safe
direction for decontamination. The raw-string join is kept as the
default because it is exactly reproducible in any engine (the DuckDB
oracle mirrors it); digesting is a flag.

Reference parity note: the reference SDK (an LLM-batch client) has no
decontamination op — this belongs to the "operations a large-scale
training-data pipeline needs" extension surface, same family as
sutro_spark/operators/dedup.py.
"""

from __future__ import annotations

from sutro_spark.session import barrier as _barrier
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def word_shingles(
    df: DataFrame,
    text_column: str = "text",
    id_column: str = "doc_id",
    n: int = 13,
    *,
    distinct: bool = True,
) -> DataFrame:
    """Word n-gram shingles per document: (id, gram).

    Tokens are whitespace-split; gram i is words [i, i+n) joined by a
    single space (so runs of whitespace normalize away — the form any
    engine reproduces). Distinctness uses the same zero-shuffle
    ``array_distinct``-before-explode trick as ``char_shingles``:
    per-document distinctness is per-row array work, no shuffle.
    """

    from sutro_spark.operators.dedup import spread

    df = spread(df)  # parallelize the expression-heavy scan stage (r16)
    toks = F.split(F.trim(F.coalesce(F.col(text_column), F.lit(""))), r"\s+")
    m = F.size(toks)
    grams = F.when(
        m >= n,
        F.transform(
            F.sequence(F.lit(1), m - n + 1),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    if distinct:
        grams = F.array_distinct(grams)
    return df.select(
        F.col(id_column).alias("id"), F.explode(grams).alias("gram")
    )


def contamination_report(
    train: DataFrame,
    benchmark: DataFrame,
    *,
    text_column: str = "text",
    id_column: str = "doc_id",
    n: int = 13,
    digest: bool = False,
) -> DataFrame:
    """Per-contaminated-doc hit counts: (id, n_hits) where n_hits is
    the number of distinct train-doc grams that appear anywhere in the
    benchmark set. Only contaminated docs appear.

    Plan: distinct benchmark grams (small) → broadcast → inner join
    against the train gram stream (map-side, no train shuffle) → one
    partial-aggregatable groupBy(id). The only shuffle is the final
    count over *hit* rows — proportional to contamination, not corpus.
    """
    bench = word_shingles(
        benchmark, text_column, id_column, n
    ).select("gram").distinct()
    tr = word_shingles(train, text_column, id_column, n)
    if digest:
        bench = bench.select(F.xxhash64("gram").alias("gram"))
        tr = tr.select("id", F.xxhash64("gram").alias("gram"))
    return (
        tr.join(F.broadcast(bench), "gram")
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
        .select(F.col("id").alias(id_column), "n_hits")
    )


def decontaminate(
    train: DataFrame,
    benchmark: DataFrame,
    *,
    text_column: str = "text",
    id_column: str = "doc_id",
    n: int = 13,
    digest: bool = False,
) -> DataFrame:
    """The filtered training set: train rows sharing NO word n-gram
    with the benchmark. Same broadcast plan as
    :func:`contamination_report`, finished with a left-anti join on the
    doc id — train columns pass through untouched."""
    bad = contamination_report(
        train, benchmark, text_column=text_column, id_column=id_column, n=n, digest=digest
    ).select(id_column)
    return train.join(bad, id_column, "left_anti")


def fuzzy_contamination(
    train: DataFrame,
    benchmark: DataFrame,
    *,
    text_column: str = "text",
    id_column: str = "doc_id",
    k: int = 8,
    num_hashes: int = 16,
    bands: int = 8,
) -> DataFrame:
    """FUZZY benchmark decontamination via cross-set MinHash-LSH:
    train docs whose signature collides with any benchmark doc on any
    band. Catches paraphrased/lightly-edited benchmark leakage that the
    exact n-gram rule (:func:`contamination_report`) misses — a small
    edit changes every 13-gram it touches, but most minhash bands
    survive.

    Same asymmetry as the exact rule: the benchmark is tiny, so its
    (band_key, id) rows broadcast and the train side streams map-side —
    one shuffle for the final per-doc count, proportional to hits.

    Output: (id, n_bench_hits) — distinct benchmark docs sharing ≥1
    band. Tune recall/precision with bands×rows like any LSH: more
    bands → higher recall, wider nets.
    """
    from sutro_spark.operators.dedup import minhash_band_rows, minhash_signatures

    t_bands = minhash_band_rows(
        minhash_signatures(train, text_column, id_column, k=k, num_hashes=num_hashes),
        num_hashes=num_hashes,
        bands=bands,
    )
    b_bands = minhash_band_rows(
        minhash_signatures(benchmark, text_column, id_column, k=k, num_hashes=num_hashes),
        num_hashes=num_hashes,
        bands=bands,
    ).select("band_key", F.col("id").alias("__bench_id")).distinct()
    return (
        t_bands.join(F.broadcast(b_bands), "band_key")
        .groupBy("id")
        .agg(F.count_distinct("__bench_id").alias("n_bench_hits"))
        .select(F.col("id").alias(id_column), "n_bench_hits")
    )


def _bloom_positions(h: int, gram_expr: str, size: int) -> str:
    """SQL for the ``h``-th Bloom position of a gram: xxhash64 with the
    probe index as a leading INT column, reduced mod ``size``. One
    native 64-bit hash per probe — the r16 replacement for the original
    sha256-hex-conv probe (three string SHA-256s per gram dominated the
    corpus scan; the Bloom family is output-invisible because the exact
    verify removes every false positive, so the swap is free)."""
    return f"pmod(xxhash64(CAST({h} AS INT), {gram_expr}), {size})"


def _bitset_from_grams(
    grams: DataFrame, *, bits_log2: int, hashes: int
) -> list[int]:
    """Pack the Bloom positions of a (gram) relation into 64-bit words.
    Positions are computed IN SPARK with the same xxhash64 family the
    probe uses (build and probe share one function — the no-false-
    negative invariant by construction); only the distinct position
    integers (<= 2^bits_log2) reach the driver."""
    size = 1 << bits_log2
    pos_rows = (
        grams.select(
            F.explode(
                F.array(
                    *[
                        F.expr(_bloom_positions(h, "gram", size))
                        for h in range(hashes)
                    ]
                )
            ).alias("p")
        )
        .distinct()
        .collect()
    )
    words = [0] * (size >> 6)
    for r in pos_rows:
        p = int(r["p"])
        words[p >> 6] |= 1 << (p & 63)
    # bit 63 makes a word >= 2^63: reinterpret as SIGNED int64 so the
    # literal array fits Spark's long (the arithmetic-shift bit test
    # downstream is sign-safe)
    return [w - (1 << 64) if w >= (1 << 63) else w for w in words]


def bloom_bitset(
    benchmark: DataFrame,
    *,
    text_column: str = "text",
    id_column: str = "doc_id",
    n: int = 13,
    bits_log2: int = 17,
    hashes: int = 3,
) -> list[int]:
    """Driver-held Bloom bitset over the benchmark's distinct word
    n-gram set, packed into 64-bit words. Holding the benchmark filter
    on the driver is the decontamination premise — eval sets are tiny
    relative to the corpus (MMLU-scale: ~10^5 grams → a 16 KiB filter
    at bits_log2=17); the CORPUS side never collects, joins, or
    shuffles. Positions come from the same xxhash64 probe family the
    flags projection evaluates, computed in Spark so build and probe
    can never diverge; only the distinct position integers are
    collected.
    """
    return _bitset_from_grams(
        word_shingles(benchmark, text_column, id_column, n).select(
            "gram"
        ).distinct(),
        bits_log2=bits_log2,
        hashes=hashes,
    )


def bloom_contamination_flags(
    train: DataFrame,
    words: list[int],
    *,
    text_column: str = "text",
    id_column: str = "doc_id",
    n: int = 13,
    bits_log2: int = 17,
    hashes: int = 3,
) -> DataFrame:
    """All train columns + ``__maybe_contaminated`` (1 iff ANY of the
    doc's word n-grams hits all ``hashes`` Bloom positions). A pure
    per-row projection against the broadcast-literal bitset — NO join,
    NO shuffle, NO state: the shape that runs unchanged on a streaming
    DataFrame and on 100 TB (the corpus is only ever scanned). False
    positives exist by construction; compose with the exact broadcast
    join on the flagged subset (:func:`bloom_decontaminate`)."""

    from sutro_spark.operators.dedup import spread

    train = spread(train)  # parallelize the expression-heavy scan stage (r16)
    size = 1 << bits_log2
    # gram construction MUST byte-match word_shingles (same trim, NO
    # lowercasing, short docs -> empty array) or bloom false NEGATIVES
    # appear and the output stops equalling exact decontaminate()
    toks = f"split(trim(coalesce({text_column}, '')), '\\\\s+')"
    gram_arr = (
        f"if(size({toks}) < {n}, array(),"
        f" transform(sequence(1, size({toks}) - {n - 1}),"
        f" i -> array_join(slice({toks}, i, {n}), ' ')))"
    )

    def probe(h: int) -> str:
        pos = _bloom_positions(h, "g", size)
        return (
            f"((shiftright(element_at(__bloom_words, CAST(shiftright({pos}, 6) AS INT) + 1),"
            f" CAST({pos} % 64 AS INT)) & 1) = 1)"
        )

    cond = " AND ".join(probe(h) for h in range(hashes))
    flag = f"exists({gram_arr}, g -> {cond})"
    return (
        train.withColumn(
            "__bloom_words", F.lit(words).cast("array<long>")
        )
        .withColumn("__maybe_contaminated", F.expr(flag).cast("int"))
        .drop("__bloom_words")
    )


def bloom_decontaminate(
    train: DataFrame,
    benchmark: DataFrame,
    *,
    text_column: str = "text",
    id_column: str = "doc_id",
    n: int = 13,
    bits_log2: int = 17,
    hashes: int = 3,
) -> DataFrame:
    """Bloom-prefiltered exact decontamination — output identical to
    :func:`decontaminate` (Bloom filters have no false negatives;
    false positives are removed by the exact verify), but the clean
    fast path is join-free: only the flagged sliver of the corpus pays
    the exact broadcast-join check. Candidates-then-verify, again.

    r16 plan shape: the benchmark's distinct grams are computed ONCE
    (eagerly localCheckpoint-ed when the benchmark is a batch frame)
    and feed both the bitset build and the exact verify join, and the
    output is a single left-anti join of the flagged corpus against
    the verified-bad ids — the probe projection runs exactly twice
    (once to find suspects, once in the output leg) instead of three
    times for the old clean ∪ (suspects − bad) union, which is
    row-identical: verified-bad ids are a subset of the suspect ids,
    so anti-joining them out of the WHOLE flagged corpus removes
    exactly the rows the union dropped."""
    bgrams = word_shingles(
        benchmark, text_column, id_column, n
    ).select("gram").distinct()
    if not benchmark.isStreaming:
        bgrams = bgrams.transform(_barrier)
    words = _bitset_from_grams(bgrams, bits_log2=bits_log2, hashes=hashes)
    flagged = bloom_contamination_flags(
        train, words, text_column=text_column, id_column=id_column,
        n=n, bits_log2=bits_log2, hashes=hashes,
    )
    suspects = flagged.where(F.col("__maybe_contaminated") == 1).drop(
        "__maybe_contaminated"
    )
    bad = (
        word_shingles(suspects, text_column, id_column, n)
        .join(F.broadcast(bgrams), "gram")
        .select(F.col("id").alias(id_column))
        .distinct()
    )
    return flagged.join(bad, id_column, "left_anti").drop(
        "__maybe_contaminated"
    )
