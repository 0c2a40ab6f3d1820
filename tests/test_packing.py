"""Context packing invariants (operators/packing.py)."""

import pytest
from pyspark.sql import functions as F

from sutro_spark.operators.packing import pack_chunk_stats, pack_contexts

BUDGET = 256


@pytest.fixture(scope="module")
def packed(documents):
    return pack_contexts(documents, budget=BUDGET).cache()


def test_offsets_are_contiguous_per_group(packed):
    # start_offset of each doc == sum of n_tokens of all earlier docs
    # in its group: equivalently, offsets+n_tokens re-derive the next
    # start. Check via self-consistency: per group, max(end) == sum(n).
    agg = (
        packed.groupBy("source")
        .agg(
            F.max(F.col("start_offset") + F.col("n_tokens")).alias("stream_end"),
            F.sum("n_tokens").alias("total_tokens"),
        )
        .collect()
    )
    assert agg
    for r in agg:
        assert r["stream_end"] == r["total_tokens"]


def test_chunk_span_matches_token_interval(packed):
    bad = packed.where(
        (F.col("n_tokens") > 0)
        & (
            (F.col("chunk_start") != F.expr(f"start_offset div {BUDGET}"))
            | (
                F.col("chunk_end")
                != F.expr(f"(start_offset + n_tokens - 1) div {BUDGET}")
            )
            | (F.col("n_chunks") != F.col("chunk_end") - F.col("chunk_start") + 1)
        )
    ).count()
    assert bad == 0


def test_chunk_stats_conserve_tokens(packed):
    stats = pack_chunk_stats(packed, budget=BUDGET)
    per_group = stats.groupBy("source").agg(
        F.sum("n_tokens").alias("chunk_tokens"),
        F.max("chunk_id").alias("last_chunk"),
        F.sum(F.when(F.col("n_tokens") != BUDGET, 1).otherwise(0)).alias("partial"),
    )
    docs_tokens = packed.groupBy("source").agg(F.sum("n_tokens").alias("doc_tokens"))
    rows = per_group.join(docs_tokens, "source").collect()
    assert rows
    for r in rows:
        # every token lands in exactly one chunk
        assert r["chunk_tokens"] == r["doc_tokens"]
        # only the final chunk of a group may be partial
        assert r["partial"] <= 1
        # chunk ids are dense 0..last
        assert r["last_chunk"] == (r["doc_tokens"] - 1) // BUDGET


def test_bucketed_packing_bounds_groups(documents):
    packed = pack_contexts(documents, budget=BUDGET, buckets=4)
    assert "bucket" in packed.columns
    # each (source, bucket) stream is independently contiguous
    agg = (
        packed.groupBy("source", "bucket")
        .agg(
            F.max(F.col("start_offset") + F.col("n_tokens")).alias("stream_end"),
            F.sum("n_tokens").alias("total_tokens"),
        )
        .collect()
    )
    assert len(agg) > 4
    for r in agg:
        assert r["stream_end"] == r["total_tokens"]


def test_empty_doc_occupies_no_chunk(spark):
    df = spark.createDataFrame(
        [("s", 1, "a b c"), ("s", 2, "   "), ("s", 3, "d")],
        "source string, doc_id int, text string",
    )
    rows = {r["doc_id"]: r for r in pack_contexts(df, budget=2).collect()}
    assert rows[2]["n_tokens"] == 0 and rows[2]["n_chunks"] == 0
    assert rows[1]["chunk_start"] == 0 and rows[1]["chunk_end"] == 1
    # doc 3 starts right after doc 1's 3 tokens despite the empty doc
    assert rows[3]["start_offset"] == 3 and rows[3]["chunk_start"] == 1


def test_length_buckets_padding_accounting(spark):
    from sutro_spark.operators.packing import length_buckets

    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "a b c d e"), (3, " ".join(["w"] * 50)),
         (4, " ".join(["w"] * 200))],
        ["doc_id", "text"],
    )
    rows = {
        r["bucket"]: r
        for r in length_buckets(
            docs, boundaries=[10, 100], batch_size=2
        ).collect()
    }
    # bucket 0: lens 3,5 -> max 5; bucket 1: len 50; open bucket: 200
    assert rows[0]["n_rows"] == 2 and rows[0]["max_len"] == 5
    assert rows[0]["padded_bucket"] == 2 * 5
    assert rows[0]["padded_global"] == 2 * 200
    assert rows[1]["upper_bound"] == 100 and rows[1]["padded_bucket"] == 50
    assert rows[2]["upper_bound"] is None  # open top bucket
    # bucketed padding never exceeds naive padding
    for r in rows.values():
        assert r["padded_bucket"] <= r["padded_global"]
    assert rows[0]["n_batches"] == 1  # ceil(2/2)


def test_length_buckets_validation(spark):
    import pytest

    from sutro_spark.operators.packing import length_buckets

    with pytest.raises(ValueError, match="batch_size"):
        length_buckets(None, batch_size=0)
    with pytest.raises(ValueError, match="boundaries"):
        length_buckets(None, boundaries=[0, 5])


# --- whole-document FFD packing ------------------------------------------


def _ffd_reference(sizes, budget):
    """Driver-side first-fit-decreasing over (size, id) pairs."""
    fills, assign = [], {}
    for size, did in sorted(sizes, key=lambda t: (-t[0], t[1])):
        for j, fill in enumerate(fills):
            if fill + size <= budget:
                fills[j] = fill + size
                assign[did] = j
                break
        else:
            assign[did] = len(fills)
            fills.append(size)
    return assign, fills


def test_ffd_matches_reference_single_group(spark):
    from sutro_spark.operators.packing import ffd_pack

    texts = ["w " * n for n in [9, 7, 7, 5, 4, 3, 2, 2, 1]]
    df = spark.createDataFrame(
        [(i, t.strip()) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    out = {r["doc_id"]: (r["grp"], r["bin"]) for r in ffd_pack(
        df, budget=10, group_size=64).collect()}
    sizes = [(len(t.split()), i) for i, t in enumerate(texts)]
    ref, fills = _ffd_reference(sizes, 10)
    assert out == {d: (0, b) for d, b in ref.items()}
    assert max(fills) <= 10


def test_ffd_invariants_blocked(documents):
    from pyspark.sql import functions as F

    from sutro_spark.operators.packing import ffd_pack

    out = ffd_pack(documents, budget=64, group_size=16)
    rows = out.collect()
    n_in = documents.count()
    assert len(rows) == n_in  # every doc assigned exactly once
    fills = {}
    for r in rows:
        if r["bin"] >= 0:
            assert r["n_tokens"] <= 64
            fills.setdefault((r["grp"], r["bin"]), 0)
            fills[(r["grp"], r["bin"])] += r["n_tokens"]
        else:
            assert r["n_tokens"] > 64
    assert all(v <= 64 for v in fills.values())  # no overflow, ever
    # first-fit: at most one bin <= half-empty per independent block
    halfempty = {}
    for (grp, _), fill in fills.items():
        if 2 * fill <= 64:
            halfempty[grp] = halfempty.get(grp, 0) + 1
    assert all(v <= 1 for v in halfempty.values())


def test_ffd_stats_verdict(documents):
    from sutro_spark.operators.packing import ffd_pack, ffd_stats

    st = ffd_stats(
        ffd_pack(documents, budget=64, group_size=16), budget=64
    ).collect()[0]
    assert st["n_overflow_bins"] == 0
    assert st["n_halfempty_bins"] <= st["n_groups"]
    assert st["n_bins"] >= st["lb_bins"]
    assert st["bound_ok"]
    assert st["fill_per_mille"] is None or st["fill_per_mille"] <= 1000


def test_ffd_validates_params(spark):
    import pytest as _pytest

    from sutro_spark.operators.packing import ffd_pack

    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with _pytest.raises(ValueError):
        ffd_pack(df, budget=0)
    with _pytest.raises(ValueError):
        ffd_pack(df, group_size=0)
