"""EXACT substring deduplication (suffix-array semantics, Lee et al.,
"Deduplicating Training Data Makes Language Models Better", ACL 2022).

North-star extension beyond the reference surface (the reference —
/root/reference — has no corpus-dedup operators; its data plane stops
at per-row transforms, see reference sdk.py:465-537). Unlike the
token-window approximations in :mod:`sutro_spark.operators.passages`
(fixed k-token windows with a keeper policy), this module computes the
paper's actual target EXACTLY: every maximal contiguous character
region covered by some substring of length >= ``min_length`` that
occurs at least ``min_count`` times corpus-wide.

Why this equals the suffix-array result
---------------------------------------
Lee et al. build one suffix array over the concatenated corpus and
mark positions inside repeated substrings of length >= L. The
distributed equivalence this module exploits:

    a character belongs to a duplicated substring of length >= L
    IFF it is covered by a duplicated window of length EXACTLY L.

(=>: any repeat of length s >= L contains, at every offset it covers,
at least one of its s-L+1 length-L sub-windows, each of which repeats
wherever the long repeat does. <=: a duplicated length-L window IS a
duplicated substring of length >= L.) So the union of [p, p+L) over
duplicated length-L window starts p is exactly the covered-character
set the suffix array would mark, and its maximal intervals are the
spans to strip. No approximation, no fixed stride, no keeper
heuristic — the fixed-k caveat documented in passages.py does not
apply here.

Spark-first shape (the suffix array is a single-machine structure; at
100 TB the corpus cannot be concatenated, but the window identity can
be shuffled):

1. HASH PREFILTER — one scan; per document a Catalyst higher-order
   function hashes every length-L window (``xxhash64`` over
   ``substring``) INSIDE the map stage, so the shuffle carries
   (hash, doc, pos) at ~20 bytes/position, never the L-byte windows
   (an L x corpus shuffle is the naive plan's killer). One map-side
   combinable groupBy counts occurrences per hash; positions whose
   hash count < min_count exit here.
2. BYTE VERIFY — hash survivors are EXACT-verified: candidate
   positions regroup per document (one array per doc), rejoin the
   document text once, re-extract the real windows for just those
   positions, and a groupBy on the window BYTES keeps only strings
   truly occurring >= min_count times. Collisions (different strings,
   same 64-bit hash) die here, so the output is hash-independent —
   the same candidate-generate + verify honesty contract as the
   MinHash/SimHash/ANN families. Shuffle cost: L bytes per CANDIDATE
   position only (the duplicated fraction), plus one doc-keyed pass.
3. SPAN MERGE — verified starts fold into maximal intervals with the
   gaps-and-islands window pattern partitioned by doc_id (per-doc
   sort bounded by document length; no corpus-wide sort).

Ultra-frequent windows (boilerplate) are safe on both hot paths: the
prefilter count is an associative agg (combiner row per map task, not
a hot reducer sort), and the verify groupBy is likewise count-only.

Deliberate plan trade-off: the candidate/verified frames are each
referenced twice (count side + semi-join side), so Catalyst computes
those subtrees twice — scans and map-side hashing are recomputed
rather than introducing a hot-key Window (count over a boilerplate
gram's partition would sort ALL its occurrences on one reducer) or an
unbounded collect_list. Rescanning is bandwidth; hot keys are
stragglers — at 100 TB the former wins.
"""

from __future__ import annotations

from sutro_spark.session import barrier as _barrier
from pyspark.sql import DataFrame, Observation, Window
from pyspark.sql import functions as F

__all__ = [
    "contaminated_spans",
    "exact_substr_positions",
    "exact_substr_spans",
    "strip_contaminated_spans",
    "strip_contaminated_spans_fixpoint",
    "strip_exact_substr",
    "strip_exact_substr_fixpoint",
]


def _prepare(df: DataFrame, text_column: str, id_column: str) -> DataFrame:
    from sutro_spark.operators.dedup import spread

    # spread: the per-position xxhash64 HOF in _window_hashes otherwise
    # runs on ONE core for a single-file scan (r16 optimization round)
    return spread(df).select(
        F.col(id_column).alias("doc_id"),
        F.coalesce(F.col(text_column), F.lit("")).alias("__t"),
    )


def _window_hashes(base: DataFrame, L: int) -> DataFrame:
    """(doc_id, pos, h): the xxhash64 of every length-``L`` window,
    1-based ``pos`` (``substring`` convention in both Spark and
    DuckDB); sequence(1, 0) DESCENDS, hence the explicit short-doc
    guard.

    r16 optimization round: explode the POSITION sequence first and
    hash in the projection above it, instead of hashing inside a
    ``transform`` lambda — higher-order-function lambdas are
    CodegenFallback (interpreted per element), while the explode +
    substring + xxhash64 projection whole-stage-codegens. Same rows,
    same hash values (identical expression per position); measured
    1.79 s → 0.25 s for this stage alone at sf0.1. Still in-scan:
    only (doc_id, pos, h) ≈ 20 bytes/position reaches any exchange."""
    return (
        base.select(
            "doc_id",
            "__t",
            F.explode(
                F.when(
                    F.length("__t") >= L,
                    F.expr(f"sequence(1, length(__t) - {L} + 1)"),
                ).otherwise(F.array().cast("array<int>"))
            ).alias("pos"),
        )
        .select(
            "doc_id",
            "pos",
            F.xxhash64(F.expr(f"substring(__t, pos, {L})")).alias("h"),
        )
    )


def _candidate_grams(base: DataFrame, cand: DataFrame, L: int) -> DataFrame:
    """Re-extract the REAL window bytes for candidate positions only:
    candidates regroup per doc (one array per doc), rejoin the text
    once, and explode back to (doc_id, pos, g) rows — L bytes travel
    only for the candidate fraction, never the whole corpus."""
    per_doc = cand.groupBy("doc_id").agg(F.collect_list("pos").alias("__ps"))
    return (
        per_doc.join(base, "doc_id")
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    f"transform(__ps,"
                    f" p -> struct(p AS pos,"
                    f" substring(__t, CAST(p AS INT), {L}) AS g))"
                )
            ).alias("e"),
        )
        .select("doc_id", F.col("e.pos").alias("pos"), F.col("e.g").alias("g"))
    )


def _window_candidates(
    df: DataFrame, text_column: str, id_column: str, L: int, min_count: int
) -> DataFrame:
    """Stage 1+2: (doc_id, pos) of every length-``L`` window whose
    exact bytes occur >= ``min_count`` times corpus-wide."""
    base = _prepare(df, text_column, id_column)
    pos = _window_hashes(base, L)
    hot = pos.groupBy("h").agg(F.count(F.lit(1)).alias("__n")).where(
        F.col("__n") >= min_count
    )
    cand = pos.join(hot.select("h"), "h", "left_semi")
    grams = _candidate_grams(base, cand, L)
    verified = grams.groupBy("g").agg(F.count(F.lit(1)).alias("__n")).where(
        F.col("__n") >= min_count
    )
    return grams.join(verified.select("g"), "g", "left_semi").select(
        "doc_id", F.col("pos").cast("long").alias("pos")
    )


def exact_substr_positions(
    df: DataFrame,
    *,
    text_column: str = "text",
    id_column: str = "doc_id",
    min_length: int = 50,
    min_count: int = 2,
) -> DataFrame:
    """1-based start positions of every length-``min_length`` window
    whose exact bytes occur at least ``min_count`` times across the
    corpus (all (doc, pos) occurrence sites count, including
    overlapping self-repeats inside one document — the suffix-array
    convention). Output: (doc_id, pos)."""
    if min_length < 2:
        raise ValueError(f"min_length must be >= 2, got {min_length}")
    if min_count < 2:
        raise ValueError(f"min_count must be >= 2, got {min_count}")
    return _window_candidates(df, text_column, id_column, min_length, min_count)


def exact_substr_spans(
    df: DataFrame,
    *,
    text_column: str = "text",
    id_column: str = "doc_id",
    min_length: int = 50,
    min_count: int = 2,
) -> DataFrame:
    """Maximal duplicated character spans — the exact ExactSubstr
    output. Output: (doc_id, span_start, span_end, span_len) with
    1-based inclusive ``span_start``, EXCLUSIVE ``span_end``; each
    span is a maximal interval of the union of [p, p+L) over
    duplicated window starts p, i.e. exactly the character set a
    suffix-array pass would mark for removal at threshold L.

    Touching-but-distinct repeats merge (the union is contiguous);
    that is the removal semantics — every covered character is inside
    SOME duplicated substring of length >= L."""
    dpos = exact_substr_positions(
        df,
        text_column=text_column,
        id_column=id_column,
        min_length=min_length,
        min_count=min_count,
    )
    return _merge_spans(dpos, min_length)


def _merge_spans(dpos: DataFrame, L: int) -> DataFrame:
    """Gaps-and-islands interval merge of covered windows [p, p+L):
    per-doc sort bounded by document length, never a corpus sort."""
    wd = Window.partitionBy("doc_id").orderBy("pos")
    brk = F.when(
        F.col("pos") - F.lag("pos").over(wd) <= L, F.lit(0)
    ).otherwise(F.lit(1))
    islands = dpos.select(
        "doc_id",
        "pos",
        F.sum(brk).over(
            wd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).alias("__island"),
    )
    return islands.groupBy("doc_id", "__island").agg(
        F.min("pos").alias("span_start"),
        (F.max("pos") + L).alias("span_end"),
    ).select(
        "doc_id",
        F.col("span_start").cast("long").alias("span_start"),
        F.col("span_end").cast("long").alias("span_end"),
        (F.col("span_end") - F.col("span_start")).cast("long").alias("span_len"),
    )


def strip_exact_substr(
    df: DataFrame,
    *,
    text_column: str = "text",
    id_column: str = "doc_id",
    min_length: int = 50,
    min_count: int = 2,
) -> DataFrame:
    """Cut every duplicated span (ALL occurrences — Lee et al.'s
    ExactSubstr drops the repeated bytes wherever they appear; a
    keeper-per-digest policy is the passages.py variant) and reassemble
    each document from the surviving segments, order-preserving.

    Output: (doc_id, n_chars, n_removed, clean_text); documents with
    no duplicated span pass through verbatim, fully-duplicated
    documents keep their row with clean_text = ''.

    Plan: spans collect per doc (a document's span count is bounded by
    len/min_length), broadcast-free single doc-keyed join, then one
    Catalyst ``aggregate`` fold builds the kept text — no Python, no
    per-character explode. Note the paper's own caveat applies to any
    ExactSubstr strip: the cut edges can CREATE new length-L repeats;
    run to fixpoint if that matters downstream."""
    spans = exact_substr_spans(
        df,
        text_column=text_column,
        id_column=id_column,
        min_length=min_length,
        min_count=min_count,
    )
    return _strip_with_spans(_prepare(df, text_column, id_column), spans)


def _strip_with_spans(base: DataFrame, spans: DataFrame) -> DataFrame:
    """Cut (span_start, span_end) intervals out of ``base`` and
    reassemble each document from the surviving segments with one
    Catalyst ``aggregate`` fold — no Python, no per-character
    explode. Left fold over the sorted spans: acc = (kept-so-far,
    cursor); each span appends the gap before it and jumps the cursor
    past it."""
    per_doc = spans.groupBy("doc_id").agg(
        F.array_sort(
            F.collect_list(F.struct("span_start", "span_end"))
        ).alias("__spans"),
        F.sum("span_len").alias("__cut"),
    )
    clean = F.expr(
        "aggregate(coalesce(__spans, array()),"
        " struct(CAST('' AS STRING) AS o, CAST(1 AS BIGINT) AS c),"
        " (acc, s) -> struct("
        "   concat(acc.o, substring(__t, CAST(acc.c AS INT),"
        "                           CAST(s.span_start - acc.c AS INT))) AS o,"
        "   s.span_end AS c),"
        " acc -> concat(acc.o, substring(__t, CAST(acc.c AS INT),"
        "                                length(__t) - CAST(acc.c AS INT) + 1)))"
    )
    return base.join(per_doc, "doc_id", "left").select(
        "doc_id",
        F.length("__t").cast("long").alias("n_chars"),
        F.coalesce(F.col("__cut"), F.lit(0)).cast("long").alias("n_removed"),
        clean.alias("clean_text"),
    )


def contaminated_spans(
    df: DataFrame,
    ref: DataFrame,
    *,
    text_column: str = "text",
    id_column: str = "doc_id",
    ref_text_column: str | None = None,
    ref_id_column: str | None = None,
    min_length: int = 50,
) -> DataFrame:
    """SPAN-level decontamination detection: maximal character spans
    of ``df`` documents whose every character is covered by a
    length->= ``min_length`` window appearing VERBATIM anywhere in the
    ``ref`` corpus (a benchmark / eval set). The surgical counterpart
    to :mod:`sutro_spark.operators.decontaminate`, which flags or
    drops WHOLE documents by n-gram overlap — here only the
    overlapping bytes are marked, so a mostly-clean document keeps
    its clean remainder (the DataComp-LM-style passage scrub).

    Same three-stage shape as :func:`exact_substr_spans`, with
    "duplicated" replaced by "present in ref": (1) both corpora hash
    their windows in-stage (8-byte shuffle rows); doc positions
    semi-join the DISTINCT ref hash set — for a benchmark-sized ref
    this broadcasts, so the corpus side never shuffles; (2) hash
    survivors byte-verify against the ref window bytes, re-extracted
    only for hash-matched ref positions (collisions die; output
    provably hash-independent); (3) covered positions merge to
    maximal intervals. Overlapping ref windows count once — presence
    is the predicate, there is no min_count.

    Output: (doc_id, span_start, span_end, span_len), 1-based
    inclusive start / exclusive end, like :func:`exact_substr_spans`.
    """
    if min_length < 2:
        raise ValueError(f"min_length must be >= 2, got {min_length}")
    L = min_length
    dbase = _prepare(df, text_column, id_column)
    rbase = _prepare(
        ref, ref_text_column or text_column, ref_id_column or id_column
    )
    dpos = _window_hashes(dbase, L)
    rpos = _window_hashes(rbase, L)
    rhash = rpos.select("h").distinct()
    cand = dpos.join(rhash, "h", "left_semi")
    # verify bytes: ref grams are extracted ONLY for ref positions
    # whose hash also occurs on the doc side (cheap even when ref is
    # large), then distinct'd — the predicate set
    rcand = rpos.join(dpos.select("h").distinct(), "h", "left_semi")
    rgrams = _candidate_grams(rbase, rcand.select("doc_id", "pos"), L).select(
        "g"
    ).distinct()
    grams = _candidate_grams(dbase, cand.select("doc_id", "pos"), L)
    verified = grams.join(rgrams, "g", "left_semi").select(
        "doc_id", F.col("pos").cast("long").alias("pos")
    )
    return _merge_spans(verified, L)


def strip_contaminated_spans(
    df: DataFrame,
    ref: DataFrame,
    *,
    text_column: str = "text",
    id_column: str = "doc_id",
    ref_text_column: str | None = None,
    ref_id_column: str | None = None,
    min_length: int = 50,
) -> DataFrame:
    """Cut every ref-overlapping span out of ``df`` (keeping the clean
    remainder of each document) — the span-level decontamination
    action. Output: (doc_id, n_chars, n_removed, clean_text), like
    :func:`strip_exact_substr`. Note the same edge caveat: cut edges
    can CREATE new length-L matches against ref; iterate to fixpoint
    when the guarantee must be absolute."""
    spans = contaminated_spans(
        df,
        ref,
        text_column=text_column,
        id_column=id_column,
        ref_text_column=ref_text_column,
        ref_id_column=ref_id_column,
        min_length=min_length,
    )
    return _strip_with_spans(_prepare(df, text_column, id_column), spans)


def strip_exact_substr_fixpoint(
    df: DataFrame,
    *,
    text_column: str = "text",
    id_column: str = "doc_id",
    min_length: int = 50,
    min_count: int = 2,
    max_iters: int = 5,
) -> DataFrame:
    """:func:`strip_exact_substr` iterated to a FIXPOINT: cutting a
    span can CREATE a new length-L repeat at the cut edge (the Lee et
    al. caveat both strip docstrings carry), so a single pass
    guarantees only that the ORIGINAL duplicated spans are gone. This
    re-runs the strip on its own output until a pass finds no
    duplicated span (or ``max_iters``), after which the corpus
    provably contains no substring of length >= ``min_length``
    occurring >= ``min_count`` times.

    Driver loop discipline (the pagerank/BPE pattern): each pass's
    output is eagerly ``localCheckpoint``-ed — the next pass reads it
    at least twice (hash side + verify side), and without the cut the
    plan would double per iteration — and the superseded round's
    blocks are released once the new one materializes. The only
    driver-side data is the per-pass span COUNT (one long).

    Convergence is guaranteed: every pass that finds spans strictly
    shrinks total corpus characters, and a pass that finds none is
    the fixpoint. Output: (doc_id, n_chars, n_removed, clean_text,
    n_passes) — n_chars the ORIGINAL length, n_removed the total cut
    across every pass, n_passes the number of stripping passes run
    (0 rows changed in the last counted pass when it converged early).
    """
    return _strip_fixpoint(
        df,
        lambda cur: exact_substr_spans(
            cur,
            text_column="__t",
            id_column="doc_id",
            min_length=min_length,
            min_count=min_count,
        ),
        text_column=text_column,
        id_column=id_column,
        max_iters=max_iters,
    )


def strip_contaminated_spans_fixpoint(
    df: DataFrame,
    ref: DataFrame,
    *,
    text_column: str = "text",
    id_column: str = "doc_id",
    ref_text_column: str | None = None,
    ref_id_column: str | None = None,
    min_length: int = 50,
    max_iters: int = 5,
) -> DataFrame:
    """:func:`strip_contaminated_spans` iterated to a FIXPOINT — the
    guarantee the decontamination use case actually needs: cutting a
    contaminated span can splice the bytes BEFORE it to the bytes
    AFTER it into a new length->= ``min_length`` verbatim ref match
    (when the benchmark contains that spliced string too), so a single
    pass only removes the matches present in the ORIGINAL text. After
    this loop the corpus provably contains NO substring of length >=
    ``min_length`` present verbatim in ``ref`` (or ``max_iters`` was
    hit — pick it so the count-zero pass is observed when the
    guarantee must be absolute).

    The loop machinery is shared with :func:`strip_exact_substr_
    fixpoint` (:func:`_strip_fixpoint` — eager per-pass
    localCheckpoint, superseded-round release, one count per pass on
    the driver); only the span oracle differs. The ``ref`` side is
    re-derived per pass by Catalyst — for a benchmark-sized ref this
    is two cheap scans per pass; persist ``ref`` upstream if it is
    large and the loop runs deep.

    Output: (doc_id, n_chars, n_removed, clean_text, n_passes), as in
    :func:`strip_exact_substr_fixpoint`.
    """
    return _strip_fixpoint(
        df,
        lambda cur: contaminated_spans(
            cur,
            ref,
            text_column="__t",
            id_column="doc_id",
            ref_text_column=ref_text_column or text_column,
            ref_id_column=ref_id_column or id_column,
            min_length=min_length,
        ),
        text_column=text_column,
        id_column=id_column,
        max_iters=max_iters,
    )


def _strip_fixpoint(
    df: DataFrame,
    spans_of,
    *,
    text_column: str,
    id_column: str,
    max_iters: int,
) -> DataFrame:
    """Shared strip-until-no-spans loop: ``spans_of(cur)`` maps the
    current (doc_id, __t, __n0) corpus to its (doc_id, span_start,
    span_end, span_len) spans — the self-dedup and decontamination
    fixpoints differ only in that oracle. Driver loop discipline (the
    pagerank/BPE pattern): each pass's output is eagerly
    ``localCheckpoint``-ed (the next pass reads it at least twice —
    hash side + verify side — and without the cut the plan would
    double per iteration) and the superseded round's blocks are
    released once the new one materializes; the only driver-side data
    is the per-pass changed-doc COUNT (one long)."""
    from sutro_spark.session import release_local_checkpoint

    if max_iters < 1:
        raise ValueError(f"max_iters must be >= 1, got {max_iters}")
    cur = _prepare(df, text_column, id_column).select(
        "doc_id", "__t", F.length("__t").cast("long").alias("__n0")
    ).transform(_barrier)
    passes = 0
    for _ in range(max_iters):
        spans = spans_of(cur)
        stripped = _strip_with_spans(
            cur.select("doc_id", "__t"), spans
        ).join(cur.select("doc_id", "__n0"), "doc_id")
        # r17 (guide §5; the CC-loop observe() pattern): a doc changed
        # this pass iff the strip cut something (``n_removed`` is
        # exactly the length delta — every span has span_len >= 1), so
        # the changed-doc count rides the checkpoint's materialization
        # job as an observe() metric instead of a separate
        # join-previous-round-and-count job per pass. Same count,
        # identical convergence decisions, one driver round-trip per
        # pass instead of two — and the join against the superseded
        # round is gone entirely.
        obs = Observation()
        nxt = (
            stripped.observe(
                obs,
                F.sum((F.col("n_removed") > 0).cast("long")).alias("chg"),
            )
            .select("doc_id", F.col("clean_text").alias("__t"), "__n0")
            .transform(_barrier)
        )
        changed = int(obs.get["chg"] or 0)
        release_local_checkpoint(cur)
        cur = nxt
        passes += 1
        if changed == 0:
            break
    return cur.select(
        "doc_id",
        F.col("__n0").alias("n_chars"),
        (F.col("__n0") - F.length("__t")).cast("long").alias("n_removed"),
        F.col("__t").alias("clean_text"),
        F.lit(passes).cast("long").alias("n_passes"),
    )
