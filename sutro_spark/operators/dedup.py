"""Deduplication operators for large-scale training-data pipelines.

Not present in the reference (its north star in BASELINE.json calls for
them); all designed shuffle-light for 100 TB:

- exact: hash-groupBy on a content digest — one shuffle on a uniform
  64-hex key, no skew.
- n-gram Jaccard: shingle → inverted-index self-join. The classic
  quadratic blowup on common shingles is capped by ``max_df`` (drop
  shingles occurring in more than max_df docs — they carry no
  discriminative signal and are exactly the skewed join keys).
- MinHash + LSH: signatures are per-doc aggregations (map-side
  combinable); banding turns all-pairs into an equi-join on band keys,
  so candidate generation is linear in the number of colliding pairs.
- SimHash: 64-bit fingerprint via per-bit weighted majority; near-dup =
  small Hamming distance.

Every hash is derived from sha2 so the DuckDB oracle can reproduce the
exact same values (MinHash uses the *lexicographic* min of sha2 hex
strings — a valid uniform min-hash that both engines compute
identically).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def normalize_text(col) -> F.Column:
    """Canonical form for near-exact dedup: lowercase, collapse
    whitespace, trim."""
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


def exact_dedup(
    df: DataFrame, text_column: str = "text", id_column: str = "doc_id", *, normalized: bool = False
) -> DataFrame:
    """Exact duplicate groups: (content_hash, keep_id = min id, dup_count).

    One shuffle on the digest; at 100 TB enable map-side partial
    aggregation (default for groupBy) and a high shuffle partition count.
    """
    content = normalize_text(F.col(text_column)) if normalized else F.col(text_column)
    return (
        df.select(F.col(id_column), F.sha2(content.cast("string"), 256).alias("content_hash"))
        .groupBy("content_hash")
        .agg(
            F.min(id_column).alias("keep_id"),
            F.count(F.lit(1)).alias("dup_count"),
        )
    )


def spread(df: DataFrame) -> DataFrame:
    """Ensure the input is spread across the cluster before a row-
    multiplying explode or an expression-heavy projection. Small/
    single-file scans arrive as 1-2 partitions; exploding (or running
    a wide regex/HOF projection) there serializes the whole pipeline
    on one core. No-op when the scan is already parallel (the 100 TB
    case).

    The check reads ``inputFiles()`` — pure scan metadata — instead of
    ``df.rdd.getNumPartitions()``, which would force a full RDD
    conversion/analysis per call.

    Streaming frames pass through untouched: micro-batch sources size
    their own partitions, and a per-batch round-robin shuffle would be
    pure overhead on the always-on path. Non-file sources (in-memory
    frames from ``createDataFrame``) also pass through: they are
    already sliced across ``defaultParallelism`` at creation, so the
    repartition would add an Exchange to plans whose operators promise
    a projection-only fast path."""
    if df.isStreaming:
        return df
    target = df.sparkSession.sparkContext.defaultParallelism
    try:
        n_files = len(df.inputFiles())
    except Exception:  # non-file source — already parallelized
        return df
    if 1 <= n_files < target:
        return df.repartition(target)
    return df


def char_shingles(
    df: DataFrame, text_column: str, id_column: str, k: int = 8, *, distinct: bool = True
) -> DataFrame:
    """Character k-gram shingles per document: (id, shingle), distinct
    per document by default. Uses sequence+transform (no Python), then
    explode.

    Distinctness is ZERO-SHUFFLE: (id, shingle)-distinct is exactly
    per-document-distinct because the id is part of the key, so
    ``array_distinct`` on the per-row gram array before the explode
    replaces the cross-partition ``.distinct()`` a naive plan would
    shuffle for. ``distinct=False`` skips even that per-row dedup for
    consumers whose aggregation is idempotent over duplicates (MinHash:
    min of a hash is unchanged by repeats)."""
    n = F.length(F.col(text_column))
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(n - F.lit(k - 1), F.lit(1))),
        lambda i: F.col(text_column).substr(i, F.lit(k)),
    )
    if distinct:
        grams = F.array_distinct(grams)
    return (
        spread(df.select(F.col(id_column).alias("id"), F.col(text_column)))
        .select("id", F.explode(grams).alias("shingle"))
        .where(F.length("shingle") == k)
    )


def _pair_intersections(
    df: DataFrame,
    text_column: str = "text",
    id_column: str = "doc_id",
    *,
    k: int = 8,
    max_df: int | None = 100,
) -> DataFrame:
    """Candidate pairs with exact integer evidence: (id_a, id_b, inter,
    na, nb) — shared-shingle count plus each side's post-max_df shingle
    count. Shared by :func:`ngram_jaccard_pairs` (derives the double
    Jaccard) and :func:`jaccard_histogram` (bins with pure integer
    division, immune to double-rounding at bucket edges)."""
    # Raw (non-distinct) shingles straight into ONE groupBy(shingle)
    # whose collect_set deduplicates (doc, shingle) map-side as part of
    # the partial aggregation — the separate explode→distinct pass would
    # shuffle the full shingle stream a second time for nothing. The
    # grouped frame then yields both the df-cap filter and the posting
    # list; pairs come from exploding the set twice (cross product per
    # shingle).
    sh = char_shingles(df, text_column, id_column, k, distinct=False)
    grouped = sh.groupBy("shingle").agg(F.collect_set("id").alias("ids"))
    if max_df is not None:
        grouped = grouped.where(F.size("ids") <= max_df)
    postings = grouped.select(F.explode("ids").alias("id"), "ids")
    sizes = postings.groupBy("id").agg(F.count(F.lit(1)).alias("n_shingles"))
    inter = (
        postings.select(F.col("id").alias("id_a"), F.explode("ids").alias("id_b"))
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    # per-doc size table is |docs| rows — AQE broadcasts it when small
    # (no hard hint: at 100 TB doc counts it must stay a shuffle join)
    sa = sizes.select(F.col("id").alias("id_a"), F.col("n_shingles").alias("na"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("n_shingles").alias("nb"))
    return inter.join(sa, "id_a").join(sb, "id_b")


def ngram_jaccard_pairs(
    df: DataFrame,
    text_column: str = "text",
    id_column: str = "doc_id",
    *,
    k: int = 8,
    threshold: float = 0.2,
    max_df: int | None = 100,
) -> DataFrame:
    """Near-duplicate pairs by n-gram Jaccard similarity.

    Inverted-index plan: distinct (doc, shingle) → drop shingles with
    document frequency > max_df (skew + noise control; REQUIRED at
    scale) → self equi-join on shingle → per-pair intersection counts →
    Jaccard = |∩| / (|A| + |B| - |∩|) with sizes computed AFTER the
    max_df filter so the metric matches the joined universe.

    Returns (id_a, id_b, jaccard) with id_a < id_b; jaccard is the raw
    integer-ratio division (bit-identical across engines — see the
    inline note on why rounding would actually *hurt* parity).
    """
    return (
        _pair_intersections(df, text_column, id_column, k=k, max_df=max_df)
        .withColumn(
            # raw division, NOT rounded: both engines divide the same
            # exact ints → identical bits, while round() at a decimal
            # tie (e.g. 41/640) differs between BigDecimal HALF_UP and
            # binary rounding
            "jaccard",
            F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def minhash_signatures(
    df: DataFrame,
    text_column: str = "text",
    id_column: str = "doc_id",
    *,
    k: int = 8,
    num_hashes: int = 16,
    hash_family: str = "sha2",
) -> DataFrame:
    """MinHash signature per doc.

    ``hash_family='sha2'`` (default, oracle-reproducible): shingle → 2
    salted sha256 digests, each split into 8 disjoint 8-hex-char
    (32-bit) chunks → 16 independent uniform hashes from only 2 digest
    computations per shingle (8× less hashing than one digest per
    hash). sig_i = lexicographic min of chunk i over the doc's
    shingles — identical in any engine. Output: (id, sig array<string>).

    ``hash_family='xxhash64'`` (scale path): one salted xxhash64 per
    hash slot — a JVM-intrinsic non-crypto hash, ~10× cheaper per call
    than sha256 and codegen-friendly. Signature elements are the
    zero-padded hex of the 64-bit min (same string-typed schema). Use
    when cross-engine bit-reproducibility is not required — dedup
    quality is equivalent.

    Per-doc min is a partial aggregation → map-side combine, single
    shuffle on id.
    """
    sh = char_shingles(df, text_column, id_column, k, distinct=False)
    if hash_family == "xxhash64":
        hashed = sh.select(
            "id",
            *[
                F.lpad(
                    F.hex(F.xxhash64(F.lit(f"s{i}:"), F.col("shingle"))), 16, "0"
                ).alias(f"h{i}")
                for i in range(num_hashes)
            ],
        )
    elif hash_family == "sha2":
        if num_hashes > 16:
            raise ValueError("num_hashes <= 16 with the 2-digest sha2 hash family")
        salted = sh.select(
            "id",
            *[
                F.sha2(F.concat(F.lit(f"s{s}:"), F.col("shingle")), 256).alias(f"d{s}")
                for s in range(2)
            ],
        )
        hashed = salted.select(
            "id",
            *[
                F.substring(F.col(f"d{i // 8}"), (i % 8) * 8 + 1, 8).alias(f"h{i}")
                for i in range(num_hashes)
            ],
        )
    else:
        raise ValueError(f"unknown hash_family {hash_family!r}; use 'sha2' or 'xxhash64'")
    agg = hashed.groupBy("id").agg(
        *[F.min(f"h{i}").alias(f"h{i}") for i in range(num_hashes)]
    )
    return agg.select(
        "id", F.array(*[F.col(f"h{i}") for i in range(num_hashes)]).alias("signature")
    )


def minhash_band_rows(sig: DataFrame, *, num_hashes: int, bands: int) -> DataFrame:
    """(id, band_key) rows from a signature frame. Band key = band id +
    the band's raw minhash values. No hash needed: docs collide iff
    their r minhashes are equal, and the concat IS that equality key (a
    sha2 here would only re-encode it, bands digests/doc slower, without
    changing the candidate set)."""
    if num_hashes % bands:
        raise ValueError("num_hashes must be divisible by bands")
    r = num_hashes // bands
    return sig.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.concat_ws(
                        "|",
                        F.lit(f"band{b}"),
                        *[F.element_at("signature", b * r + j + 1) for j in range(r)],
                    )
                    for b in range(bands)
                ]
            )
        ).alias("band_key"),
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_column: str = "text",
    id_column: str = "doc_id",
    *,
    k: int = 8,
    num_hashes: int = 16,
    bands: int = 8,
    verify_threshold: float | None = 0.2,
    hash_family: str = "sha2",
) -> DataFrame:
    """MinHash-LSH candidate pairs (optionally Jaccard-verified).

    Banding: split the signature into ``bands`` bands of r = H/bands
    rows; band key = sha2(band_id || minhashes). Docs sharing any band
    key become candidates — an equi-join on the band key instead of an
    all-pairs comparison (the whole point at 100 TB).
    """
    if num_hashes % bands:
        raise ValueError("num_hashes must be divisible by bands")
    r = num_hashes // bands
    sig = minhash_signatures(
        df, text_column, id_column, k=k, num_hashes=num_hashes, hash_family=hash_family
    )
    band_rows = minhash_band_rows(sig, num_hashes=num_hashes, bands=bands)
    # Bucket once and explode pairs from the posting list — the
    # signature pipeline runs a single time (a self-join would carry it
    # on both sides) and candidates cost one shuffle on band_key.
    cand = (
        band_rows.groupBy("band_key")
        .agg(F.collect_list("id").alias("ids"))
        .select(F.explode("ids").alias("id_a"), "ids")
        .select("id_a", F.explode("ids").alias("id_b"))
        .where(F.col("id_a") < F.col("id_b"))
        .distinct()
    )
    if verify_threshold is None:
        return cand
    # Verify ONLY the candidate pairs: restrict the shingle postings to
    # docs that appear in some candidate, then count intersections by
    # joining the pair list to each side's shingle set. Cost scales with
    # |candidates| x shingles/doc — never corpus² (the old path re-ran
    # exact all-pairs Jaccard over the whole corpus, negating LSH).
    # Note: this is TRUE Jaccard (no max_df cap) — correct for
    # verification; max_df is a candidate-generation skew guard, not a
    # similarity definition.
    sh = char_shingles(df, text_column, id_column, k)
    members = (
        cand.select(F.col("id_a").alias("id"))
        .unionByName(cand.select(F.col("id_b").alias("id")))
        .distinct()
    )
    sh = sh.join(members, "id")  # AQE broadcasts `members` when small
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("n_shingles"))
    inter = (
        cand.join(sh.select(F.col("id").alias("id_a"), "shingle"), "id_a")
        .join(sh.select(F.col("id").alias("id_b"), "shingle"), ["id_b", "shingle"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col("id").alias("id_a"), F.col("n_shingles").alias("na"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("n_shingles").alias("nb"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("jaccard", F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")))
        .where(F.col("jaccard") >= verify_threshold)
        .select("id_a", "id_b", "jaccard")
    )


def incremental_jaccard_pairs(
    corpus: DataFrame,
    new: DataFrame,
    text_column: str = "text",
    id_column: str = "doc_id",
    *,
    k: int = 8,
    threshold: float = 0.1,
    max_df: int | None = 100,
) -> DataFrame:
    """Incremental near-dup: new batch vs existing corpus ONLY (not
    within-new) — the shape a daily training-data ingest actually runs.
    Same posting-list plan as ``ngram_jaccard_pairs`` with a side tag;
    at scale the corpus shingles are precomputed+persisted and only the
    new side is shingled per increment.

    Returns (corpus_id, new_id, jaccard).
    """
    sh_c = char_shingles(corpus, text_column, id_column, k).withColumn(
        "side", F.lit(0)
    )
    sh_n = char_shingles(new, text_column, id_column, k).withColumn("side", F.lit(1))
    sh = sh_c.unionByName(sh_n)
    grouped = sh.groupBy("shingle").agg(
        F.collect_list(F.struct("id", "side")).alias("members")
    )
    if max_df is not None:
        grouped = grouped.where(F.size("members") <= max_df)
    postings = grouped.select(F.explode("members").alias("m"), "members").select(
        F.col("m.id").alias("id"), F.col("m.side").alias("side"), "members"
    )
    sizes = postings.groupBy("id", "side").agg(F.count(F.lit(1)).alias("n_shingles"))
    inter = (
        postings.where(F.col("side") == 0)
        .select(F.col("id").alias("corpus_id"), F.explode("members").alias("m"))
        .where(F.col("m.side") == 1)
        .groupBy("corpus_id", F.col("m.id").alias("new_id"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sc = sizes.where(F.col("side") == 0).select(
        F.col("id").alias("corpus_id"), F.col("n_shingles").alias("nc")
    )
    sn = sizes.where(F.col("side") == 1).select(
        F.col("id").alias("new_id"), F.col("n_shingles").alias("nn")
    )
    return (
        inter.join(sc, "corpus_id")
        .join(sn, "new_id")
        .withColumn(
            "jaccard",
            F.col("inter") / (F.col("nc") + F.col("nn") - F.col("inter")),
        )
        .where(F.col("jaccard") >= threshold)
        .select("corpus_id", "new_id", "jaccard")
    )


def simhash(
    df: DataFrame, text_column: str = "text", id_column: str = "doc_id", *, bits: int = 64
) -> DataFrame:
    """64-bit SimHash fingerprint from whitespace tokens.

    Per token: sha2 hex → per-bit ±1 votes; fingerprint bit b is the
    sign of the vote sum. Bit b lives in hex digit b//4 at weight
    3-(b%4). Everything is built-in expressions — (doc × token × bit)
    explode then two groupBys, all map-side combinable.

    Output: (id, simhash bigint) with bit 63 kept zero (bits 0..62) so
    the value stays positive in signed 64-bit engines.
    """
    bits = min(bits, 63)
    toks = spread(df.select(F.col(id_column).alias("id"), F.col(text_column))).select(
        "id",
        F.explode(F.split(F.trim(F.col(text_column)), r"\s+")).alias("tok"),
    ).where(F.col("tok") != "")
    # Parse the first 16 hex chars ONCE into two 32-bit halves and
    # recombine into the leading-64-bit hash value v; fingerprint bit b
    # is v-bit (63-b). ~30× fewer string operations per token than
    # digit-wise instr().
    hashed = toks.select(
        "id",
        F.conv(F.substring(F.sha2(F.col("tok"), 256), 1, 8), 16, 10)
        .cast("long")
        .alias("hi"),
        F.conv(F.substring(F.sha2(F.col("tok"), 256), 9, 8), 16, 10)
        .cast("long")
        .alias("lo"),
    )
    # PACKED bit-count lanes (r16 optimization round): the naive form —
    # one ±1 vote column per bit, 63 sum aggregates — spends more time
    # in Catalyst planning/codegen than in execution (measured 1.25 s
    # plan + 0.59 s exec at sf0.1) because the tree carries ~450
    # expression nodes. Instead sum, per doc, the 32 masked values
    #   p_j = Σ_tokens ((v >> j) & 0x0000000100000001)   j = 0..31
    # so p_j's low 32 bits count tokens with v-bit j set and its high
    # 32 bits count v-bit (j+32) — two lanes per aggregate, 33 agg
    # columns instead of 63 and half the vote-projection width. The
    # vote sum s_b = 2·cnt_b − n, so bit b is set iff 2·cnt_b > n:
    # identical integers to the ±1 formulation, bit-for-bit.
    # Overflow-safe by construction: a Spark string column holds < 2^31
    # chars, so a doc has < 2^30 whitespace tokens; each 32-bit lane
    # counts at most n < 2^30 << 2^32, and the high lane (bits 32..61)
    # never reaches the sign bit — p_j stays non-negative at ANY
    # reachable document size, no 100 TB caveat.
    # Wide column lists are built as SQL strings (selectExpr / one
    # F.expr per aggregate): the Column-DSL form costs 3-5 py4j
    # round-trips per expression node, which for this operator measured
    # MORE driver time than the whole distributed execution. One parsed
    # string per column keeps plan construction O(columns) JVM calls.
    lanes = 0x0000000100000001
    packed = hashed.selectExpr(
        "id",
        *[
            f"shiftright(shiftleft(hi, 32) | lo, {j}) & {lanes}L AS p{j}"
            for j in range(32)
        ],
    )
    sums = packed.groupBy("id").agg(
        F.expr("count(1) AS n"),
        *[F.expr(f"sum(p{j}) AS s{j}") for j in range(32)],
    )

    def cnt(b: int) -> str:
        # tokens voting 1 on fingerprint bit b (= v-bit 63-b)
        vbit = 63 - b
        if vbit >= 32:
            return f"shiftright(s{vbit - 32}, 32)"
        return f"(s{vbit} & {0xFFFFFFFF}L)"

    fingerprint = " + ".join(
        f"(CASE WHEN 2 * {cnt(b)} > n THEN CAST({1 << b} AS BIGINT)"
        " ELSE CAST(0 AS BIGINT) END)"
        for b in range(bits)
    )
    return sums.selectExpr("id", f"({fingerprint}) AS simhash")


def hamming_pairs(
    fp: DataFrame,
    fingerprint_column: str = "simhash",
    id_column: str = "id",
    *,
    max_hamming: int = 3,
    block_bits: int = 16,
) -> DataFrame:
    """Pairs of ids whose <=64-bit fingerprints are within
    ``max_hamming`` — EXACTLY, via pigeonhole blocking: a pair within
    Hamming<=3 must agree verbatim on at least one of 4 16-bit chunks,
    so candidates come from 4 equi-joins, never all-pairs. Shared by
    every fixed-width-fingerprint family (SimHash text, dHash images).

    The pigeonhole guarantee (no missed pair) holds iff
    max_hamming <= n_chunks - 1 (<= 3 at the 16-bit default). Larger
    budgets still work but degrade to LSH-style candidate generation —
    a pair differing in every chunk can be missed; measure that recall
    with ``metrics.candidate_recall`` like the other approximate paths.
    """
    n_chunks = (64 + block_bits - 1) // block_bits
    chunks = fp.select(
        F.col(id_column).alias("id"),
        F.col(fingerprint_column).alias("fp"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("chunk_id"),
                        F.shiftright(F.col(fingerprint_column), i * block_bits)
                        .bitwiseAND((1 << block_bits) - 1)
                        .alias("chunk"),
                    )
                    for i in range(n_chunks)
                ]
            )
        ).alias("c"),
    ).select("id", "fp", "c.chunk_id", "c.chunk")
    cand = (
        chunks.groupBy("chunk_id", "chunk")
        .agg(F.collect_list(F.struct("id", "fp")).alias("members"))
        .select(F.explode("members").alias("x"), "members")
        .select("x", F.explode("members").alias("y"))
        .where(F.col("x.id") < F.col("y.id"))
        .select(
            F.col("x.id").alias("id_a"),
            F.col("y.id").alias("id_b"),
            F.col("x.fp").alias("fp_a"),
            F.col("y.fp").alias("fp_b"),
        )
        .distinct()
    )
    return (
        cand.withColumn("ham", F.bit_count(F.col("fp_a").bitwiseXOR(F.col("fp_b"))))
        .where(F.col("ham") <= max_hamming)
        .select("id_a", "id_b", "ham")
    )


def simhash_pairs(
    df: DataFrame,
    text_column: str = "text",
    id_column: str = "doc_id",
    *,
    max_hamming: int = 3,
    block_bits: int = 16,
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance <= max_hamming.

    Scale path: block on 16-bit chunks (a pair within Hamming<=3 of a
    63-bit hash must agree exactly on at least one of 4 chunks —
    pigeonhole), so candidates come from 4 equi-joins, not all-pairs.
    """
    sh = simhash(df, text_column, id_column)
    return hamming_pairs(
        sh, "simhash", "id", max_hamming=max_hamming, block_bits=block_bits
    )


def dedup_lines_global(
    df: DataFrame,
    text_column: str = "text",
    id_column: str = "doc_id",
    *,
    min_line_chars: int = 0,
    unit: str = "line",
) -> DataFrame:
    """Corpus-WIDE line deduplication (the C4 rule): every distinct
    line of text survives exactly once across the whole corpus — at its
    first occurrence in (doc id, line position) order — and each
    document is reassembled from its surviving lines in original order.

    ``unit="paragraph"`` applies the same rule at PARAGRAPH granularity
    (the Gopher/MassiveText variant): text splits on blank-line runs
    (``\\n\\n+``) and reassembles with a single blank line between
    surviving paragraphs — separator width is normalized, which is the
    standard lossy trade of paragraph-level dedup.

    Plan: explode lines with their position (in-scan, no shuffle), then
    pick the first (doc, pos) occurrence per distinct line with a
    ``groupBy(line).agg(min(struct(id, pos)))`` — a MIN aggregate, not a
    rank window, so it is map-side combinable: even a line that appears
    in every document of a 100 TB corpus (blank separators, boilerplate)
    is reduced to one candidate per map task before the shuffle — no
    single hot reducer, no salting needed. Protected lines (shorter
    than ``min_line_chars``) never enter the shuffle at all; they pass
    through as themselves (attribution boilerplate is what the rule is
    for; gutting two-char lines corpus-wide would mangle code/text).
    One groupBy(doc) then rebuilds the text with an order-by-position
    array sort — never a collect, never a driver-side string.

    Output: (id, text, n_lines, n_kept) with text rebuilt from kept
    lines ('' when every line lost).
    """
    if unit not in ("line", "paragraph"):
        raise ValueError("unit must be 'line' or 'paragraph'")
    split_pat, joiner = ("\n", "\n") if unit == "line" else (r"\n\n+", "\n\n")
    text = F.coalesce(F.col(text_column), F.lit(""))
    lines = spread(df.select(F.col(id_column).alias("id"), text.alias("__t"))).select(
        "id",
        F.posexplode(F.split(F.col("__t"), split_pat)).alias("pos", "line"),
    )
    protected = F.length(F.col("line")) < min_line_chars
    winners = (
        lines.where(~protected)
        .groupBy("line")
        .agg(F.min(F.struct("id", "pos")).alias("__w"))
        .select(F.col("__w.id").alias("id"), F.col("__w.pos").alias("pos"), "line")
    )
    survivors = winners.unionByName(
        lines.where(protected).select("id", "pos", "line")
    )
    n_lines = df.select(
        F.col(id_column).alias("id"),
        F.size(F.split(text, split_pat)).cast("long").alias("n_lines"),
    )
    rebuilt = (
        survivors.groupBy("id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "line"))),
                    lambda s: s["line"],
                ),
                joiner,
            ).alias(text_column),
            F.count(F.lit(1)).cast("long").alias("n_kept"),
        )
    )
    return (
        n_lines.join(rebuilt, "id", "left")
        .select(
            F.col("id").alias(id_column),
            F.coalesce(F.col(text_column), F.lit("")).alias(text_column),
            "n_lines",
            F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
        )
    )


def jaccard_histogram(
    df: DataFrame,
    text_column: str = "text",
    id_column: str = "doc_id",
    *,
    k: int = 8,
    max_df: int | None = 100,
    buckets: int = 10,
) -> DataFrame:
    """Threshold-sweep evidence for near-dup tuning: the distribution
    of candidate-pair Jaccard similarities in one pass, so a curator
    picks the dedup threshold from data instead of folklore.

    Buckets are INTEGER math — bucket = min(buckets-1,
    (inter * buckets) div union) — no floats anywhere, so both engines
    bin identically even at exact bucket boundaries. ``n_pairs_ge`` is
    the running count of pairs at-or-above each bucket's lower edge
    (the number of pairs a threshold at that edge would merge) via one
    bounded window over ``buckets`` rows.

    Output: (bucket int, n_pairs bigint, n_pairs_ge bigint).

    Plan: identical candidate generation to :func:`ngram_jaccard_pairs`
    (posting lists, max_df skew cap) with threshold=0 — the histogram
    sees every candidate pair; pairs that share no shingle are by
    definition below any useful threshold and cost nothing.
    """
    pairs = _pair_intersections(df, text_column, id_column, k=k, max_df=max_df)
    sized = pairs.select(
        F.least(
            F.lit(buckets - 1),
            F.expr(f"CAST((inter * {buckets}) DIV (na + nb - inter) AS INT)"),
        ).alias("bucket")
    )
    hist = sized.groupBy("bucket").agg(F.count(F.lit(1)).alias("n_pairs"))
    w = (
        Window.orderBy(F.desc("bucket"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return hist.select(
        "bucket",
        F.col("n_pairs").cast("long").alias("n_pairs"),
        F.sum("n_pairs").over(w).cast("long").alias("n_pairs_ge"),
    )


def dup_size_histogram(
    df: DataFrame,
    text_column: str = "text",
    id_column: str = "doc_id",
    *,
    normalized: bool = True,
) -> DataFrame:
    """Duplicate-cluster SIZE distribution: for each exact-duplicate
    cluster size s, how many clusters have that size and how many
    documents they hold — the one-glance dedup diagnostic (a heavy
    tail at large s means boilerplate; n_docs at s=1 is the unique
    mass that survives dedup untouched).

    Two map-side-combinable aggregations over shrinking keys: digest →
    cluster size (|docs| rows in, |clusters| out), then size →
    histogram (|clusters| in, |distinct sizes| out — dozens). Nothing
    here grows with corpus size except the first digest shuffle that
    exact dedup already pays.

    Output: (cluster_size bigint, n_clusters bigint, n_docs bigint),
    one row per observed size.
    """
    clusters = exact_dedup(
        df, text_column=text_column, id_column=id_column, normalized=normalized
    )
    return (
        clusters.groupBy(F.col("dup_count").alias("cluster_size"))
        .agg(F.count(F.lit(1)).alias("n_clusters"))
        .select(
            "cluster_size",
            "n_clusters",
            (F.col("cluster_size") * F.col("n_clusters")).alias("n_docs"),
        )
    )


def winnow_fingerprints(
    df: DataFrame,
    text_column: str = "text",
    id_column: str = "doc_id",
    *,
    k: int = 8,
    window: int = 4,
    salt: str = "winnow",
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
    SIGMOD 2003 — the MOSS algorithm): hash every char ``k``-gram,
    slide a ``window`` of consecutive gram hashes over the document,
    keep the minimum hash of each full window, and deduplicate per
    document. Guarantees: any shared substring of length >=
    ``k + window - 1`` produces at least one shared fingerprint, and
    the expected fingerprint density is 2/(window+1) of all grams —
    position-robust local sampling that plain every-nth sampling
    can't give.

    Hash = the repo's portable 32-bit sha256-prefix (same
    construction as functions/sampling.hash_bucket), so any engine
    reproduces the fingerprint set bit-for-bit.

    Scale shape: grams explode inside the scan stage; the sliding min
    is ONE bounded per-doc window (sort bounded by document length,
    parallel across docs); distinct is a map-side-combinable
    aggregate on (id, fp). No corpus×corpus anything.

    Output: (id, fp bigint) — one row per distinct fingerprint per doc.
    """
    if k < 1 or window < 1:
        raise ValueError(f"k and window must be >= 1, got k={k} window={window}")
    # null/short texts survive via the length(gram) == k filter: their
    # sequence degenerates and every candidate gram comes up short.
    # r16 optimization round: (a) spread the scan — the gram explode +
    # per-gram sha2 otherwise runs on ONE core for a single-file input;
    # (b) carry the per-doc gram count through the explode (array size
    # at projection time) instead of a second count(*) window over the
    # full gram stream — one less Window operator on the hot path. The
    # gram count equals the count(*) the window computed because every
    # gram of a text with length >= k has exactly length k (substr
    # shortfall only happens when the whole text is shorter than k, and
    # then NO gram survives the filter while n_grams - window is
    # already < 0 for any pos — identical row survivorship).
    # r16: explode the 1-based position sequence and extract the gram
    # in the projection ABOVE the explode — the old transform() lambda
    # was CodegenFallback (interpreted per gram) while explode +
    # substring whole-stage-codegens; identical (pos, gram) rows (the
    # length filter keeps the same survivors: any in-range position of
    # a text with length >= k yields exactly k chars)
    grams = spread(
        df.select(F.col(id_column).alias("id"), F.col(text_column))
    ).select(
        "id",
        F.expr(f"greatest(length({text_column}) - {k - 1}, 0)").alias("n_grams"),
        F.col(text_column).alias("__t"),
    ).select(
        "id",
        "n_grams",
        F.explode(
            F.when(
                F.col("n_grams") >= 1, F.expr("sequence(1, n_grams)")
            ).otherwise(F.array().cast("array<int>"))
        ).alias("__g"),
        F.col("__t"),
    ).select(
        "id",
        "n_grams",
        (F.col("__g") - 1).alias("pos"),
        F.expr(f"substring(__t, __g, {k})").alias("gram"),
    ).where(F.length("gram") == k)
    hashed = grams.select(
        "id",
        "pos",
        "n_grams",
        F.conv(
            F.substring(F.sha2(F.concat(F.lit(f"{salt}:"), F.col("gram")), 256), 1, 8),
            16,
            10,
        )
        .cast("long")
        .alias("h"),
    )
    fwd = Window.partitionBy("id").orderBy(F.col("pos").asc()).rowsBetween(0, window - 1)
    return (
        hashed.withColumn("fp", F.min("h").over(fwd))
        # full windows only: pos is 0-based, last full window starts
        # at n_grams - window
        .where(F.col("pos") <= F.col("n_grams") - window)
        .select("id", "fp")
        .distinct()
    )


def winnow_overlap(
    df: DataFrame,
    text_column: str = "text",
    id_column: str = "doc_id",
    *,
    k: int = 8,
    window: int = 4,
    min_shared: int = 2,
    max_df: int = 100,
    salt: str = "winnow",
) -> DataFrame:
    """Near-dup candidate pairs by shared winnowing fingerprints — the
    MOSS similarity report. Same inverted-index shape as
    :func:`ngram_jaccard`: fingerprints whose document frequency
    exceeds ``max_df`` are dropped before the self-join (boilerplate
    fingerprints would otherwise create a df² hot key), so the join
    fan-out is bounded at max_df² per fingerprint.

    Output: (id_a, id_b, n_shared) with id_a < id_b and n_shared >=
    ``min_shared``.
    """
    fps = winnow_fingerprints(
        df, text_column, id_column, k=k, window=window, salt=salt
    )
    dfreq = fps.groupBy("fp").agg(F.count(F.lit(1)).alias("df"))
    rare = fps.join(dfreq.where(F.col("df") <= max_df), "fp")
    a = rare.select(F.col("fp"), F.col("id").alias("id_a"))
    b = rare.select(F.col("fp"), F.col("id").alias("id_b"))
    return (
        a.join(b, "fp")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .where(F.col("n_shared") >= min_shared)
    )


def containment_pairs(
    df: DataFrame,
    text_column: str = "text",
    id_column: str = "doc_id",
    *,
    k: int = 8,
    threshold: float = 0.8,
    max_df: int | None = 100,
) -> DataFrame:
    """Asymmetric near-duplicate pairs by shingle CONTAINMENT: the
    smaller document's shingle set mostly inside the larger's —
    c = |A intersect B| / min(|A|, |B|). Jaccard divides by the UNION,
    so a short document quoted verbatim inside a long one scores near
    |short|/|long| and slips under any Jaccard threshold; containment
    scores it ~1. This is the subset-duplicate detector (quotes,
    concatenated corpora, boilerplate-wrapped copies) complementing
    symmetric Jaccard — same Broder (1997) resemblance-vs-containment
    distinction the shingling literature draws.

    Same inverted-index plan and exact integer evidence as
    ngram_jaccard_pairs (shared `_pair_intersections`; the df cap is
    REQUIRED at scale); the score is the raw division of exact ints
    (bit-identical cross-engine — the rounding note there applies).

    Output: (id_a, id_b, contained_id, containment) with id_a < id_b;
    contained_id is the smaller-set side (ties -> id_a), the document
    a dedup policy would drop or annotate.
    """
    return (
        _pair_intersections(df, text_column, id_column, k=k, max_df=max_df)
        .withColumn(
            "containment", F.col("inter") / F.least(F.col("na"), F.col("nb"))
        )
        .where(F.col("containment") >= threshold)
        .select(
            "id_a",
            "id_b",
            F.when(F.col("na") <= F.col("nb"), F.col("id_a"))
            .otherwise(F.col("id_b"))
            .alias("contained_id"),
            "containment",
        )
    )


def prefix_filter_pairs(
    df: DataFrame,
    text_column: str = "text",
    id_column: str = "doc_id",
    *,
    threshold_milli: int = 600,
) -> DataFrame:
    """LOSSLESS Jaccard similarity join by prefix filtering (the
    AllPairs / PPJoin candidate scheme — Bayardo et al. WWW 2007,
    Xiao et al. WWW 2008): every pair of documents whose word-set
    Jaccard is >= threshold is found, with NO probabilistic miss.

    The complement of this repo's recall-traded generators: MinHash-
    LSH and the df-capped inverted index (`ngram_jaccard_pairs`) buy
    speed with measured recall < 1; prefix filtering buys its speed
    from a THEOREM — order every document's distinct tokens by a
    global rarity order (ascending df, ties by token); if
    J(A, B) >= t, the first |A| - ceil(t*|A|) + 1 tokens of A and the
    corresponding prefix of B must share a token. So only prefix
    tokens are indexed, and rare tokens (tiny posting lists) dominate
    the prefixes. Use it where a dedup decision must be certifiably
    complete (e.g. legal/compliance dedup, eval-set decontamination).

    All arithmetic integer-exact: ceil(t*|d|) = (t_milli*|d| + 999)
    div 1000; the verify keeps 1000*inter >= t_milli*(na+nb-inter)
    (division-free), and jaccard_milli is floor-div evidence.

    Plan: tokenize -> df counts (map-side combinable) -> rank window
    per doc -> prefix slice -> token self-join over PREFIX postings
    only, pruned in-join by the PPJoin length filter
    (1000*least(na,nb) >= t_milli*greatest(na,nb)) and positional
    filter (remaining-token overlap bound) — both lossless by the
    same AllPairs/PPJoin theorems, both free because sz/pos ride the
    posting lists -> distinct candidate pairs -> one exact
    intersection groupBy. The prefix join is the only quadratic-risk
    stage and it is bounded by rare-token posting lists; everything
    downstream is per-candidate.

    Output: (id_a, id_b, inter, na, nb, jaccard_milli), id_a < id_b.
    """
    if not 0 < threshold_milli <= 1000:
        raise ValueError("threshold_milli must be in (0, 1000]")
    tok = df.select(
        F.col(id_column).cast("long").alias("id"),
        F.explode(
            F.array_distinct(
                F.filter(
                    F.split(
                        F.lower(F.coalesce(F.col(text_column), F.lit(""))),
                        "[^a-z0-9]+",
                    ),
                    lambda x: x != "",
                )
            )
        ).alias("t"),
    )
    dfreq = tok.groupBy("t").agg(F.count(F.lit(1)).cast("long").alias("dfq"))
    w = Window.partitionBy("id").orderBy("dfq", "t")
    ranked = (
        tok.join(dfreq, "t")
        .withColumn("pos", F.row_number().over(w))
        .withColumn(
            "sz", F.count(F.lit(1)).over(Window.partitionBy("id"))
        )
    )
    prefix = ranked.where(
        F.col("pos")
        <= F.col("sz")
        - F.expr(f"({threshold_milli} * sz + 999) div 1000")
        + 1
    ).select("id", "t", "pos", "sz")
    # PPJoin pruning (both LOSSLESS, both free — sz/pos already ride
    # the posting lists, so neither costs a join or a shuffle):
    #  - length filter: J(A,B) >= t  =>  t*max(|A|,|B|) <= min(|A|,|B|)
    #  - positional filter: at the FIRST shared prefix token the
    #    overlap is bounded by 1 + min(na-pos_a, nb-pos_b), which must
    #    reach the required overlap ceil(t*(na+nb)/(1+t)). A later
    #    shared token may fail this row-level test, but the
    #    first-token row of every truly-similar pair always passes, so
    #    the pair survives the distinct — completeness is preserved
    #    (the brute-force-equality pytest is the proof obligation).
    req = F.expr(
        f"({threshold_milli} * (sz_a + sz_b) + {1000 + threshold_milli} - 1)"
        f" div {1000 + threshold_milli}"
    )
    cand = (
        prefix.select(
            F.col("id").alias("id_a"),
            "t",
            F.col("pos").alias("pos_a"),
            F.col("sz").alias("sz_a"),
        )
        .join(
            prefix.select(
                F.col("id").alias("id_b"),
                "t",
                F.col("pos").alias("pos_b"),
                F.col("sz").alias("sz_b"),
            ),
            "t",
        )
        .where(
            (F.col("id_a") < F.col("id_b"))
            & (
                F.lit(1000) * F.least("sz_a", "sz_b")
                >= F.lit(threshold_milli) * F.greatest("sz_a", "sz_b")
            )
            & (
                F.lit(1)
                + F.least(
                    F.col("sz_a") - F.col("pos_a"),
                    F.col("sz_b") - F.col("pos_b"),
                )
                >= req
            )
        )
        .select("id_a", "id_b")
        .distinct()
    )
    ta = tok.select(F.col("id").alias("id_a"), "t")
    tb = tok.select(F.col("id").alias("id_b"), "t")
    inter = (
        cand.join(ta, "id_a")
        .join(tb, ["id_b", "t"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).cast("long").alias("inter"))
    )
    sizes = tok.groupBy("id").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    return (
        inter.join(
            sizes.select(F.col("id").alias("id_a"), F.col("n").alias("na")),
            "id_a",
        )
        .join(
            sizes.select(F.col("id").alias("id_b"), F.col("n").alias("nb")),
            "id_b",
        )
        .where(
            F.lit(1000) * F.col("inter")
            >= F.lit(threshold_milli)
            * (F.col("na") + F.col("nb") - F.col("inter"))
        )
        .select(
            "id_a",
            "id_b",
            "inter",
            "na",
            "nb",
            F.expr(
                "CAST((1000 * inter) div (na + nb - inter) AS BIGINT)"
            ).alias("jaccard_milli"),
        )
    )


def weighted_jaccard_pairs(
    df: DataFrame,
    text_column: str = "text",
    id_column: str = "doc_id",
    *,
    k: int = 8,
    threshold: float = 0.2,
    max_df: int | None = 100,
) -> DataFrame:
    """Near-duplicate pairs by WEIGHTED (multiset) n-gram Jaccard.

    Set Jaccard (:func:`ngram_jaccard_pairs`) collapses repeated
    shingles, so a document that repeats one passage 50 times and a
    document containing it once look identical on the shingle SET.
    The multiset metric keeps per-doc shingle counts:

        J_w(A, B) = sum_s min(a_s, b_s) / sum_s max(a_s, b_s)
                  = inter / (T_a + T_b - inter)

    (a_s, b_s = occurrence counts, T = post-cap total occurrences) —
    the boilerplate/template-dedup signal the set metric underreports,
    and exactly the weighted-Jaccard objects ICWS-style sketches
    approximate; this is the exact form, with the same inverted-index
    plan discipline as the set variant:

    - ONE groupBy(shingle, id) count (map-side combinable) feeds ONE
      groupBy(shingle) posting-list build; document-frequency cap
      applies to DISTINCT docs per shingle (identical universe rule as
      the set metric — sizes and totals computed after the cap);
    - pairs explode per shingle within the df-capped lists, carrying
      min(a_s, b_s) as exact integers; the final Jaccard is the raw
      division of exact BIGINTs (bit-identical across engines).

    Returns (id_a, id_b, inter, ta, tb, wjaccard), id_a < id_b.
    """
    sh = char_shingles(df, text_column, id_column, k, distinct=False)
    wts = sh.groupBy("shingle", "id").agg(
        F.count(F.lit(1)).cast("long").alias("w")
    )
    grouped = wts.groupBy("shingle").agg(
        F.collect_list(F.struct("id", "w")).alias("ids")
    )
    if max_df is not None:
        grouped = grouped.where(F.size("ids") <= max_df)
    postings = grouped.select(
        F.explode("ids").alias("a"), "ids"
    ).select(F.col("a.id").alias("id"), F.col("a.w").alias("w"), "ids")
    totals = postings.groupBy("id").agg(F.sum("w").cast("long").alias("t"))
    inter = (
        postings.select(
            F.col("id").alias("id_a"),
            F.col("w").alias("wa"),
            F.explode("ids").alias("b"),
        )
        .select("id_a", "wa", F.col("b.id").alias("id_b"), F.col("b.w").alias("wb"))
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.sum(F.least("wa", "wb")).cast("long").alias("inter"))
    )
    ta = totals.select(F.col("id").alias("id_a"), F.col("t").alias("ta"))
    tb = totals.select(F.col("id").alias("id_b"), F.col("t").alias("tb"))
    return (
        inter.join(ta, "id_a")
        .join(tb, "id_b")
        .withColumn(
            # raw division of exact BIGINTs — same parity rule as the
            # set variant (rounding at decimal ties would break it)
            "wjaccard",
            F.col("inter") / (F.col("ta") + F.col("tb") - F.col("inter")),
        )
        .where(F.col("wjaccard") >= threshold)
        .select("id_a", "id_b", "inter", "ta", "tb", "wjaccard")
    )
