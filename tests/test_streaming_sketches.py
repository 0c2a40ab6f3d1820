"""Streaming CMS maintenance == batch sketch over everything ingested."""

from pyspark.sql import functions as F

from sutro_spark.functions.sketches import cms_counts
from sutro_spark.streaming.sketches import streaming_cms


def test_streaming_cms_equals_batch(spark, sf_dir, tmp_path):
    events = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .where(F.col("user_id") < 40)
        .select("user_id")
    )
    src = str(tmp_path / "ev")
    # two files → at least two streamed micro-batches under availableNow
    a, b = events.randomSplit([0.5, 0.5], seed=3)
    a.coalesce(1).write.mode("overwrite").parquet(src)
    b.coalesce(1).write.mode("append").parquet(src)

    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    try:
        q = (
            streaming_cms(stream, "user_id", depth=3, width=64)
            .writeStream.format("memory")
            .queryName("cms_stream")
            .outputMode("complete")
            .trigger(availableNow=True)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .start()
        )
        q.processAllAvailable()
        q.stop()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)

    got = {
        (r.row, r.bucket): r.cnt
        for r in spark.sql("select * from cms_stream").collect()
    }
    batch = {
        (r.row, r.bucket): r.cnt
        for r in cms_counts(
            spark.read.parquet(src), "user_id", depth=3, width=64
        ).collect()
    }
    assert got == batch
    assert sum(got.values()) == 3 * spark.read.parquet(src).count()


def test_streaming_hll_equals_batch(spark, sf_dir, tmp_path):
    from sutro_spark.functions.sketches import hll_distinct, hll_from_registers
    from sutro_spark.streaming.sketches import streaming_hll

    events = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type", "user_id"
    )
    src = str(tmp_path / "ev")
    a, b = events.randomSplit([0.5, 0.5], seed=11)
    a.coalesce(1).write.mode("overwrite").parquet(src)
    b.coalesce(1).write.mode("append").parquet(src)

    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    try:
        q = (
            streaming_hll(stream, "event_type", "user_id")
            .writeStream.format("memory")
            .queryName("hll_stream")
            .outputMode("complete")
            .trigger(availableNow=True)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .start()
        )
        q.processAllAvailable()
        q.stop()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)

    stream_est = {
        r.grp: (r.n_zero, r.s_scaled, r.est_hll)
        for r in hll_from_registers(spark.sql("select * from hll_stream")).collect()
    }
    batch_est = {
        r.grp: (r.n_zero, r.s_scaled, r.est_hll)
        for r in hll_distinct(
            spark.read.parquet(src), "event_type", "user_id"
        ).collect()
    }
    assert stream_est == batch_est


def test_streaming_anisotropy_equals_batch(spark, sf_dir, tmp_path):
    """r10: the anisotropy state (dim+2 integers) maintained over
    micro-batches finishes to EXACTLY the batch diagnostic over the
    union of everything ingested."""
    from sutro_spark.operators.similarity import embedding_anisotropy
    from sutro_spark.streaming.sketches import (
        anisotropy_from_state,
        streaming_anisotropy,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    src = str(tmp_path / "emb")
    a, b = emb.randomSplit([0.5, 0.5], seed=7)
    a.coalesce(1).write.mode("overwrite").parquet(src)
    b.coalesce(1).write.mode("append").parquet(src)

    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    try:
        q = (
            streaming_anisotropy(stream)
            .writeStream.format("memory")
            .queryName("aniso_stream")
            .outputMode("complete")
            .trigger(availableNow=True)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .start()
        )
        q.processAllAvailable()
        q.stop()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)

    got = anisotropy_from_state(spark.sql("select * from aniso_stream")).collect()[0]
    want = embedding_anisotropy(spark.read.parquet(src)).collect()[0]
    assert got["n_vecs"] == want["n_vecs"]
    assert got["t_self"] == want["t_self"]
    assert got["s_norm2"] == want["s_norm2"]
    assert got["anisotropy"] == want["anisotropy"]


def test_streaming_mg_matches_sequential_replay(spark, sf_dir, tmp_path):
    """stream (per-trigger MG truncation) == sequential Python replay
    over the same micro-batch sequence, and the final per-key
    underestimates respect the n_shard/(k+1) mergeability bound."""
    from collections import Counter

    from pyspark.sql import functions as F

    from sutro_spark.functions.sampling import hash_bucket
    from sutro_spark.streaming.sketches import streaming_mg

    raw = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("event_id", F.expr("event_id & -event_id").alias("key"))
        .orderBy("event_id")
    )
    src = str(tmp_path / "mg_src")
    # three sequential micro-batches: one file each
    batches = [
        raw.where((F.col("event_id") % 3) == i).coalesce(1)
        for i in range(3)
    ]
    for b in batches:
        b.write.mode("append").parquet(src)
    schema = spark.read.parquet(src).schema
    k, shards = 3, 2
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    try:
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = (
            streaming_mg(stream, "key", k=k, shards=shards)
            .writeStream.format("memory")
            .queryName("mg_stream")
            .outputMode("update")
            .trigger(availableNow=True)
            .option("checkpointLocation", str(tmp_path / "mg_ckpt"))
            .start()
        )
        q.processAllAvailable()
        q.stop()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    out = spark.sql("select * from mg_stream").collect()
    # final state = the max-n_seen rows per shard
    last_seen = {}
    for r in out:
        last_seen[r["shard"]] = max(last_seen.get(r["shard"], 0), r["n_seen"])
    got = {
        (r["shard"], r["key"]): r["est"]
        for r in out
        if r["n_seen"] == last_seen[r["shard"]]
    }

    # sequential replay: the same per-file batch order Spark used
    # (maxFilesPerTrigger=1 processes files in listing order; replay
    # per-shard so order across shards is irrelevant)
    import glob
    import os

    # FileStreamSource orders by modification time (ms), path breaking
    # ties — mirror that exactly so the replay sees Spark's batch order
    files = sorted(
        glob.glob(f"{src}/part-*.parquet"),
        key=lambda p: (int(os.path.getmtime(p) * 1000), p),
    )
    shard_of = {
        r["key"]: r["shard"]
        for r in raw.select(
            F.col("key").cast("string").alias("key"),
            hash_bucket(F.col("key").cast("string"), salt="mg", buckets=shards)
            .cast("long")
            .alias("shard"),
        )
        .distinct()
        .collect()
    }
    state = {s: {} for s in range(shards)}
    for f in files:
        batch = Counter(
            str(r["key"]) for r in spark.read.parquet(f).collect()
        )
        per_shard = {}
        for key, c in batch.items():
            per_shard.setdefault(shard_of[key], Counter())[key] += c
        for s, cnts in per_shard.items():
            merged = Counter(state[s])
            merged.update(cnts)
            ranked = sorted(merged.items(), key=lambda t: (-t[1], t[0]))
            thr = ranked[k][1] if len(ranked) > k else 0
            state[s] = {kk: c - thr for kk, c in ranked[:k] if c - thr > 0}
    expected = {
        (s, kk): est for s, cnts in state.items() for kk, est in cnts.items()
    }
    assert got == expected

    # bound: per-key underestimate <= its shard's n/(k+1)
    exact = Counter(str(r["key"]) for r in raw.collect())
    n_shard = Counter()
    for key, c in exact.items():
        n_shard[shard_of[key]] += c
    for key, c in exact.items():
        est = expected.get((shard_of[key], key), 0)
        assert 0 <= c - est <= n_shard[shard_of[key]] // (k + 1)


def test_encoding_damage_stream_equals_batch(spark, sf_dir, tmp_path):
    """the detector is a per-row projection, so it must run UNCHANGED
    on readStream and emit exactly the batch rows."""
    from pyspark.sql import functions as F

    from sutro_spark.functions.text import (
        MOJIBAKE_MARKERS,
        encoding_damage_profile,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(50)
    corrupted = docs.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(F.col("text"), F.lit(MOJIBAKE_MARKERS[0])),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    src = str(tmp_path / "enc_src")
    corrupted.coalesce(1).write.mode("overwrite").parquet(src)
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)
    q = (
        encoding_damage_profile(stream)
        .writeStream.format("memory")
        .queryName("enc_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "enc_ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {
        r["id"]: (r["n_mojibake"], r["n_replacement"], r["damaged"])
        for r in spark.sql("select * from enc_stream").collect()
    }
    expected = {
        r["id"]: (r["n_mojibake"], r["n_replacement"], r["damaged"])
        for r in encoding_damage_profile(
            spark.read.parquet(src)
        ).collect()
    }
    assert got == expected
    assert any(v[2] for v in got.values())  # corruption actually seen


def test_streaming_mg_drops_null_keys(spark, sf_dir, tmp_path):
    """NULL keys never reach the MG state op (ADVICE r12): pandas
    value_counts() drops NaN, so unfiltered nulls would inflate n_seen
    — and the n/(k+1) error bound's n — without entering any counter
    (and would hash to a NULL shard group). Mirror of the batch
    mg_bucket_summaries' IS NOT NULL filter."""
    from pyspark.sql import functions as F

    from sutro_spark.streaming.sketches import streaming_mg

    src = str(tmp_path / "mgnull_src")
    spark.createDataFrame(
        [("a",), ("a",), ("b",), (None,), (None,), (None,)],
        "key string",
    ).coalesce(1).write.parquet(src)
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)
    q = (
        streaming_mg(stream, "key", k=4, shards=1)
        .writeStream.format("memory")
        .queryName("mgnull_stream")
        .outputMode("update")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "mgnull_ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    out = spark.sql("select * from mgnull_stream").collect()
    assert {r["shard"] for r in out} == {0}
    # n_seen counts only the 3 non-null rows; both keys kept exactly
    assert {(r["key"], r["est"], r["n_seen"]) for r in out} == {
        ("a", 2, 3),
        ("b", 1, 3),
    }


def test_streaming_qdigest_replay_and_global_bound(spark, sf_dir, tmp_path):
    """stream (per-trigger leaf-add + compress) == sequential Python
    replay over the same micro-batch sequence, AND the merged shard
    digests answer quantiles within the bits*n/k bound (q-digest full
    mergeability, Agarwal et al. 2012)."""
    import glob
    import os
    from collections import Counter

    from pyspark.sql import functions as F

    from sutro_spark.functions.sampling import hash_bucket
    from sutro_spark.functions.sketches import qdigest_quantiles
    from sutro_spark.streaming.sketches import (
        _qdigest_py_compress,
        streaming_qdigest,
    )

    bits, k, shards = 8, 16, 2
    raw = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("event_id", (F.col("event_id") % 251).alias("v"))
        .orderBy("event_id")
        .limit(3000)
    )
    src = str(tmp_path / "qd_src")
    for i in range(3):
        raw.where((F.col("event_id") % 3) == i).coalesce(1).write.mode(
            "append"
        ).parquet(src)
    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        streaming_qdigest(stream, "v", bits=bits, k=k, shards=shards)
        .writeStream.format("memory")
        .queryName("qd_stream")
        .outputMode("update")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "qd_ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    out = spark.sql("select * from qd_stream").collect()
    last_seen = {}
    for r in out:
        last_seen[r["shard"]] = max(last_seen.get(r["shard"], 0), r["n_seen"])
    got = {
        (r["shard"], r["id"]): r["cnt"]
        for r in out
        if r["n_seen"] == last_seen[r["shard"]]
    }

    # sequential replay in Spark's (mtime, path) batch order
    files = sorted(
        glob.glob(f"{src}/part-*.parquet"),
        key=lambda p: (int(os.path.getmtime(p) * 1000), p),
    )
    shard_of = {
        int(r["v"]): r["shard"]
        for r in raw.select(
            "v",
            hash_bucket(F.col("v").cast("string"), salt="qd", buckets=shards)
            .cast("long")
            .alias("shard"),
        )
        .distinct()
        .collect()
    }
    state = {s: ({}, 0) for s in range(shards)}
    for f in files:
        batch = [int(r["v"]) for r in spark.read.parquet(f).collect()]
        per_shard = {}
        for v in batch:
            per_shard.setdefault(shard_of[v], []).append(v)
        for s, vs in per_shard.items():
            counts, n_seen = state[s]
            n_seen += len(vs)
            for v, c in Counter(vs).items():
                leaf = v + (1 << bits)
                counts[leaf] = counts.get(leaf, 0) + c
            thr = n_seen // k
            if thr > 0:
                counts = _qdigest_py_compress(counts, bits, thr)
            state[s] = (counts, n_seen)
    expected = {
        (s, nid): c for s, (cnts, _) in state.items() for nid, c in cnts.items()
    }
    assert got == expected
    # per-shard state bounded
    for s, (cnts, _) in state.items():
        assert len(cnts) <= 3 * k

    # global quantiles from the MERGED shard digests stay in bound
    final = spark.createDataFrame(
        [(nid, c) for (_, nid), c in got.items()], "id long, cnt long"
    ).groupBy("id").agg(F.sum("cnt").cast("long").alias("cnt"))
    rows = qdigest_quantiles(final, bits=bits).collect()
    vals = [int(r["v"]) for r in raw.collect()]
    for r in rows:
        true_rank = sum(1 for v in vals if v <= r["value"])
        assert abs(true_rank - r["target_rank"]) <= bits * len(vals) // k


def test_script_gate_stream_equals_batch(spark, sf_dir, tmp_path):
    """the nine-class gate is a per-row projection, so it must run
    UNCHANGED on readStream and emit exactly the batch rows."""
    from pyspark.sql import functions as F

    from sutro_spark.functions.text import script_gate

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(50)
    mixed = docs.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(F.col("text"), F.lit(" привет عالم 안녕")),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    src = str(tmp_path / "sg_src")
    mixed.coalesce(1).write.mode("overwrite").parquet(src)
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)
    q = (
        script_gate(stream)
        .writeStream.format("memory")
        .queryName("sg_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "sg_ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {
        r["id"]: (r["n_letters"], r["dominant"], r["mixed"])
        for r in spark.sql("select * from sg_stream").collect()
    }
    expected = {
        r["id"]: (r["n_letters"], r["dominant"], r["mixed"])
        for r in script_gate(spark.read.parquet(src)).collect()
    }
    assert got == expected and any(v[2] for v in got.values())


def test_card_hits_stream_equals_batch(spark, sf_dir, tmp_path):
    """Luhn card detection/redaction is a per-row projection, so it
    must run UNCHANGED on readStream and emit exactly the batch rows."""
    from pyspark.sql import functions as F

    from sutro_spark.functions.text import card_hits

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(50)
    seeded = docs.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 4 == 0,
            F.concat(F.col("text"), F.lit(" card 4539578763621486")),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    src = str(tmp_path / "card_src")
    seeded.coalesce(1).write.mode("overwrite").parquet(src)
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)
    q = (
        card_hits(stream)
        .select("doc_id", "n_valid_cards", "has_card", "redacted")
        .writeStream.format("memory")
        .queryName("card_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "card_ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {
        r["doc_id"]: (r["n_valid_cards"], r["has_card"], r["redacted"])
        for r in spark.sql("select * from card_stream").collect()
    }
    expected = {
        r["doc_id"]: (r["n_valid_cards"], r["has_card"], r["redacted"])
        for r in card_hits(spark.read.parquet(src))
        .select("doc_id", "n_valid_cards", "has_card", "redacted")
        .collect()
    }
    assert got == expected and any(v[1] for v in got.values())
