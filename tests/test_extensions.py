"""Unit tests for the training-pipeline extension operators
(dedup / similarity / text analysis / multimodal)."""

from pyspark.sql import functions as F

from sutro_spark.functions.text import fingerprint, lang_id, token_count
from sutro_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash,
)
from sutro_spark.operators.multimodal import attach_fake_media, decode_media, sample_frames
from sutro_spark.operators.similarity import brute_force_topk, ivf_topk


def test_exact_dedup_groups(spark):
    df = spark.createDataFrame(
        [(1, "hello world"), (2, "hello world"), (3, "other")], "doc_id long, text string"
    )
    out = {r["keep_id"]: r["dup_count"] for r in exact_dedup(df).collect()}
    assert out == {1: 2, 3: 1}


def test_near_dup_pipeline_finds_planted_pair(spark):
    base = "the quick brown fox jumps over the lazy dog and runs far away tonight"
    rows = [(1, base), (2, base + " extra"), (3, "completely different words entirely here")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    jac = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(df, k=5, threshold=0.3, max_df=None).collect()
    }
    assert (1, 2) in jac and jac[(1, 2)] > 0.7
    cand = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_pairs(df, k=5, num_hashes=16, bands=8, verify_threshold=None).collect()
    }
    assert (1, 2) in cand


def test_simhash_identical_texts_equal(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "alpha beta gamma"), (3, "delta epsilon zeta")],
        "doc_id long, text string",
    )
    fps = {r["id"]: r["simhash"] for r in simhash(df).collect()}
    assert fps[1] == fps[2]
    assert fps[1] != fps[3]
    assert all(v >= 0 for v in fps.values())  # bit 63 unused


def test_brute_force_topk_nearest_is_duplicate_vector(spark):
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [1.0, 0.001, 0.0]),
        (2, [0.0, 1.0, 0.0]),
        (3, [0.0, 0.0, 1.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = brute_force_topk(df, df.where(F.col("vec_id") == 0), k=2).collect()
    assert [r["neighbor_id"] for r in sorted(out, key=lambda r: r["rank"])] == [1, 2]


def test_ivf_topk_matches_brute_force_on_probed_bucket(spark):
    rows = [(i, [float(i % 3 == 0), float(i % 3 == 1), float(i % 3 == 2)]) for i in range(9)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0]), (2, [0.0, 0.0, 1.0])],
        "centroid_id long, embedding array<double>",
    )
    out = ivf_topk(df, df.where(F.col("vec_id") == 0), cents, k=2, nprobe=1).collect()
    # probing the single nearest bucket finds the co-located vectors 3, 6
    assert {r["neighbor_id"] for r in out} == {3, 6}


def test_text_functions(spark):
    df = spark.createDataFrame(
        [(1, "The cat and the dog in a house")], "id long, text string"
    )
    row = df.select(
        token_count(F.col("text")).alias("n"),
        lang_id(F.col("text")).alias("lang"),
        fingerprint(F.col("text")).alias("fp"),
    ).first()
    assert row["n"] == 8
    assert row["lang"] == "en"
    reordered = spark.createDataFrame([(1, "a house the dog and in the cat The")], "id long, text string")
    fp2 = reordered.select(fingerprint(F.col("text")).alias("fp")).first()["fp"]
    assert row["fp"] == fp2  # order-invariant canonical fingerprint


def test_multimodal_decode_and_frames(spark):
    df = spark.createDataFrame([(1, "abcd" * 10)], "doc_id long, text string")
    media = attach_fake_media(df)
    feats = decode_media(media).first()
    assert feats["n_bytes"] == 40
    assert "media" not in decode_media(media).columns  # blob dropped post-extract
    frames = sample_frames(media, every_nth=5).collect()
    n_frames = 40 % 30 + 1  # metadata rule
    assert len(frames) == len(range(0, n_frames, 5))
    assert all(r["frame_id"] % 5 == 0 for r in frames)


def _tiny_png(gray: int = 200) -> bytes:
    """Minimal valid 1×1 8-bit grayscale PNG, hand-assembled from
    stdlib struct+zlib — lets the gated PIL decode path be exercised
    with a REAL image wherever PIL exists, without shipping fixtures."""
    import struct
    import zlib

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", zlib.crc32(tag + data))
        )

    ihdr = struct.pack(">IIBBBBB", 1, 1, 8, 0, 0, 0, 0)
    idat = zlib.compress(b"\x00" + bytes([gray]))
    return (
        b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", idat) + chunk(b"IEND", b"")
    )


def test_decode_media_gated_real_path_with_stub_fallback(spark):
    """Passes in BOTH environments: with PIL importable the auto decoder
    reads actual pixels; without it, auto == stub byte features. The
    schema and plan are identical either way."""
    from sutro_spark.operators.multimodal import decode_media

    png = _tiny_png(gray=200)
    df = spark.createDataFrame([(1, bytearray(png))], "doc_id long, media binary")
    media = df.withColumn(
        "media_meta",
        F.struct(
            F.lit("image/png").alias("media_type"),
            F.lit(3).alias("width"),  # metadata lies: real image is 1×1
            F.lit(2).alias("height"),
            F.lit(1).alias("n_frames"),
            F.lit(0).alias("sample_rate"),
        ),
    )
    auto = decode_media(media).first()
    stub = decode_media(media, decoder="stub").first()
    assert stub["n_bytes"] == len(png)
    assert stub["aspect"] == 3 / 2  # stub trusts the metadata
    try:
        import PIL  # noqa: F401

        has_pil = True
    except ImportError:
        has_pil = False
    if has_pil:
        # real decode: 1×1 image of luma 200, aspect from decoded dims
        assert auto["aspect"] == 1.0
        assert auto["mean_byte"] == 200.0
    else:
        assert auto == stub  # honest fallback, same values


def test_audio_features_real_wav_decode(spark):
    """The stdlib-wave path is REAL in this container: synthesize a
    16-bit PCM WAV with known samples and assert the features come from
    the decoded samples, not the container bytes."""
    import io
    import wave

    import numpy as np

    from sutro_spark.operators.multimodal import audio_features

    samples = np.array([1000, -1000, 2000, -2000], dtype="<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(samples.tobytes())
    wav = buf.getvalue()
    df = spark.createDataFrame(
        [(1, bytearray(wav)), (2, b"not a wav at all")],
        "doc_id long, audio binary",
    ).withColumn("audio_meta", F.struct(F.lit(16000).alias("sample_rate")))
    rows = {r["doc_id"]: r for r in audio_features(df).collect()}
    # real decode: 4 samples, mean 0, rms = sqrt(mean of squares)
    assert rows[1]["n_samples"] == 4
    assert rows[1]["mean_amp"] == 0.0
    assert rows[1]["rms"] == float(np.sqrt((samples.astype(np.int64) ** 2).mean()))
    # non-WAV payload: byte-level fallback over the raw 16 bytes
    assert rows[2]["n_samples"] == 16


def test_minhash_xxhash64_family_equivalent_candidates(spark):
    base = "the quick brown fox jumps over the lazy dog and runs far away tonight"
    rows = [(1, base), (2, base + " extra"), (3, "completely different words entirely here")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    fast = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_pairs(
            df, k=5, num_hashes=16, bands=8, verify_threshold=None, hash_family="xxhash64"
        ).collect()
    }
    assert (1, 2) in fast
    assert (1, 3) not in fast and (2, 3) not in fast


def test_minhash_unknown_family_raises(spark):
    df = spark.createDataFrame([(1, "abcdefgh")], "doc_id long, text string")
    import pytest
    from sutro_spark.operators.dedup import minhash_signatures

    with pytest.raises(ValueError, match="hash_family"):
        minhash_signatures(df, hash_family="md5")


def test_minhash_verify_is_pair_scoped_true_jaccard(spark):
    base = "the quick brown fox jumps over the lazy dog and runs far away tonight"
    rows = [(1, base), (2, base + " extra"), (3, "completely different words entirely here")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    verified = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in minhash_lsh_pairs(df, k=5, num_hashes=16, bands=8, verify_threshold=0.3).collect()
    }
    exact = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(df, k=5, threshold=0.3, max_df=None).collect()
    }
    assert (1, 2) in verified
    assert verified[(1, 2)] == exact[(1, 2)]  # verify = true Jaccard, uncapped


def test_decontaminate_flags_exact_ngram_overlap(spark):
    from sutro_spark.operators.decontaminate import (
        contamination_report,
        decontaminate,
        word_shingles,
    )

    train = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),   # contains bench gram
            (2, "alpha beta gamma nope delta epsilon"),   # shares words, not the 4-gram
            (3, "totally unrelated text goes right here"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "beta gamma delta epsilon")], "doc_id long, text string"
    )
    rep = {r["doc_id"]: r["n_hits"] for r in contamination_report(train, bench, n=4).collect()}
    assert rep == {1: 1}
    clean = sorted(r["doc_id"] for r in decontaminate(train, bench, n=4).collect())
    assert clean == [2, 3]
    # word_shingles: per-doc distinct, whitespace-normalizing
    sh = word_shingles(
        spark.createDataFrame([(1, "a  b a b a b")], "doc_id long, text string"),
        n=2,
    )
    grams = sorted(r["gram"] for r in sh.collect())
    assert grams == ["a b", "b a"]  # distinct, single-space joined


def test_decontaminate_short_docs_yield_no_grams(spark):
    from sutro_spark.operators.decontaminate import word_shingles

    df = spark.createDataFrame([(1, "one two three"), (2, None)], "doc_id long, text string")
    assert word_shingles(df, n=5).count() == 0


def test_gopher_quality_rules(spark):
    from sutro_spark.operators.quality import gopher_quality

    good = " ".join(
        ["the quick brown fox jumps over the lazy dog and runs away tonight"] * 1
        + ["word%d stuff happens here again and again in the story" % i for i in range(6)]
    )
    repeated = "spam ham " * 40  # top 2-gram dominates
    multiline = "\n".join(["same line"] * 8 + ["unique"])
    symbols = " ".join(["### ... ###"] * 20)
    rows = [(1, good), (2, repeated), (3, multiline), (4, symbols), (5, "short text")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r.asDict() for r in gopher_quality(df).collect()}

    assert out[1]["keep"] == 1
    assert out[2]["top_2gram_frac"] > 0.2 and out[2]["keep"] == 0
    assert out[3]["dup_line_frac"] > 0.3 and out[3]["keep"] == 0
    assert out[4]["symbol_word_ratio"] > 0.1 and out[4]["keep"] == 0
    assert out[5]["n_words"] == 2 and out[5]["keep"] == 0
    # metric sanity on the good doc
    assert 3.0 <= out[1]["mean_word_len"] <= 10.0
    assert out[1]["alpha_word_frac"] >= 0.8
    assert out[1]["stop_hits"] >= 2


def test_linear_quality_score_deterministic_and_weighted(spark):
    from sutro_spark.operators.quality import (
        default_weights,
        hash_bucket,
        linear_quality_score,
    )

    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "alpha beta gamma"), (3, "")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in linear_quality_score(df).collect()}
    assert set(out) == {1, 2}  # empty doc drops out
    assert out[1]["score"] == out[2]["score"]  # same text -> same score
    assert out[1]["n_tokens"] == 3
    assert out[1]["label"] in (0, 1)

    # score is exactly the mean of the hashed buckets' weights
    w = {r["bucket"]: r["w_milli"] for r in default_weights(spark, 4096).collect()}
    toks = spark.createDataFrame([(t,) for t in ["alpha", "beta", "gamma"]], "tok string")
    buckets = [r["b"] for r in toks.select(hash_bucket(F.col("tok"), 4096).alias("b")).collect()]
    expected = round(sum(w[b] for b in buckets) / (1000 * 3), 6)
    assert abs(out[1]["score"] - expected) < 1e-9

    # custom weights override the default table
    wt = spark.range(4096).select(
        F.col("id").alias("bucket"), F.lit(7).alias("w_milli")
    )
    custom = linear_quality_score(df, weights=wt).collect()[0]
    assert custom["score"] == round(7 / 1000, 6) and custom["label"] == 1


def test_compression_signals_orders_by_redundancy(spark):
    from sutro_spark.operators.quality import compression_signals

    df = spark.createDataFrame(
        [
            (1, "spam " * 200),            # highly repetitive
            (2, "the quick brown fox jumps over the lazy dog " * 5),
            (3, ""),                        # empty
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in compression_signals(df).collect()}
    assert out[1].compression_ratio < out[2].compression_ratio < 1.0
    assert out[3].compression_ratio == 0.0 and out[3].compressed_len > 0
    # deterministic: same input -> same bytes counts
    again = {r.doc_id: r.compressed_len for r in compression_signals(df).collect()}
    assert again == {k: v.compressed_len for k, v in out.items()}


def test_nfc_report_parity_and_single_scan_shape(spark):
    import unicodedata

    from sutro_spark.operators.quality import nfc_report

    rows = [
        (1, "plain ascii only"),
        (2, "cafe\u0301 papers"),  # decomposed -> NOT NFC
        (3, "caf\u00e9 papers"),  # composed non-ASCII, already NFC
        (4, None),  # contract: (1, 0, 0)
        (5, ""),
        (6, "A\u030angstro\u0308m units"),  # decomposed
        (7, "na\u00efve ascii+latin1 mix"),  # composed, already NFC
        (8, "\U0001f600 non-BMP emoji"),  # 4-byte UTF-8, already NFC
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.id: r for r in nfc_report(df).collect()}
    assert set(out) == {i for i, _ in rows}
    for i, t in rows:
        if t is None:
            assert (out[i].is_nfc, out[i].raw_len, out[i].nfc_len) == (1, 0, 0)
        else:
            n = unicodedata.normalize("NFC", t)
            assert out[i].is_nfc == int(t == n), i
            assert out[i].raw_len == len(t), i
            assert out[i].nfc_len == len(n), i
    # routing shape: one scan, one Python stage. Two rewrites measured
    # SLOWER at sf0.1 and were left out (r17): a filter+union ASCII
    # split (0.99 s, second scan) and a mapInArrow vectorized gate
    # (0.81 s) vs this mapInPandas at 0.66 s — pin the single-scan shape
    plan = nfc_report(df)._jdf.queryExecution().executedPlan().toString()
    assert "Union" not in plan


# ---------------------------------------------------------------------------
# video_frames: real Y4M container parse + deterministic stub fallback
# ---------------------------------------------------------------------------


def _y4m_payload(width, height, frames, subsampling=b"C420"):
    """Build a real YUV4MPEG2 stream: header + FRAME records of planar
    YUV bytes (Y plane per `frames`, chroma zero-filled)."""
    header = b"YUV4MPEG2 W%d H%d F25:1 Ip A1:1 %s\n" % (width, height, subsampling)
    chroma = (width * height) // 2 if subsampling == b"C420" else 0
    body = b"".join(
        b"FRAME\n" + bytes(y_plane) + bytes(chroma) for y_plane in frames
    )
    return header + body


def test_video_frames_parses_real_y4m(spark):
    from sutro_spark.operators.multimodal import video_frames

    f0 = [10] * 8   # 4x2 Y plane, mean 10
    f1 = [0, 0, 0, 0, 255, 255, 255, 255]  # mean 127.5
    payload = _y4m_payload(4, 2, [f0, f1])
    df = spark.createDataFrame([("v1", bytearray(payload))], "vid string, media binary")
    out = sorted(video_frames(df).collect(), key=lambda r: r.frame_id)
    assert [(r.frame_id, r.width, r.height, r.mean_luma, r.decoder) for r in out] == [
        (0, 4, 2, 10.0, "y4m"),
        (1, 4, 2, 127.5, "y4m"),
    ]
    assert out[0].vid == "v1"
    assert "media" not in out[0].asDict()  # blob never survives the stage


def test_video_frames_every_nth_and_truncated_tail(spark):
    from sutro_spark.operators.multimodal import video_frames

    frames = [[i] * 8 for i in range(5)]
    payload = _y4m_payload(4, 2, frames) + b"FRAME\n\x01\x02"  # truncated 6th
    df = spark.createDataFrame([("v", bytearray(payload))], "vid string, media binary")
    out = sorted(video_frames(df, every_nth=2).collect(), key=lambda r: r.frame_id)
    assert [r.frame_id for r in out] == [0, 2, 4]
    assert [r.mean_luma for r in out] == [0.0, 2.0, 4.0]


def test_video_frames_stub_fallback_same_schema(spark):
    from sutro_spark.operators.multimodal import video_frames

    # non-Y4M payload → deterministic stub, IDENTICAL schema
    df = spark.createDataFrame(
        [("s", bytearray(bytes([1, 2, 3, 4, 5, 6, 7, 8, 9])))],
        "vid string, media binary",
    )
    auto = video_frames(df).collect()
    stub = video_frames(df, decoder="stub").collect()
    assert [r.asDict() for r in auto] == [r.asDict() for r in stub]
    assert [(r.frame_id, r.width, r.mean_luma, r.decoder) for r in auto] == [
        (0, 2, 2.5, "stub"),
        (1, 2, 6.5, "stub"),
    ]


def test_video_frames_null_and_empty_payloads(spark):
    from sutro_spark.operators.multimodal import video_frames

    df = spark.createDataFrame(
        [("a", None), ("b", bytearray(b""))], "vid string, media binary"
    )
    assert video_frames(df).count() == 0


def test_video_frames_validation(spark):
    import pytest as _pytest

    from sutro_spark.operators.multimodal import video_frames

    df = spark.createDataFrame([("a", bytearray(b"x"))], "vid string, media binary")
    with _pytest.raises(ValueError):
        video_frames(df, every_nth=0)
    with _pytest.raises(ValueError):
        video_frames(df, decoder="ffmpeg")


# ---------------------------------------------------------------------------
# winnowing fingerprints (Schleimer et al. 2003)
# ---------------------------------------------------------------------------


def test_winnow_guarantee_shared_substring(spark):
    # the winnowing guarantee: any shared substring of length
    # >= k + window - 1 (= 11 at defaults) yields >= 1 shared
    # fingerprint, wherever it sits in either document
    from sutro_spark.operators.dedup import winnow_overlap

    shared = "XYZQWERTYUI"  # 11 chars
    df = spark.createDataFrame(
        [(1, "aaaaaaa " + shared + " bbbbbbbb"),
         (2, "cccccccccccc " + shared),
         (3, "no common content at all here")],
        "doc_id long, text string",
    )
    pairs = {(r.id_a, r.id_b) for r in winnow_overlap(df, min_shared=1).collect()}
    assert (1, 2) in pairs
    assert not any(3 in p for p in pairs)


def test_winnow_density_and_determinism(spark):
    # expected density 2/(window+1): fingerprints ≪ grams; and the
    # fingerprint set is a pure function of content (rerun-identical)
    from sutro_spark.operators.dedup import winnow_fingerprints

    text = "the quick brown fox jumps over the lazy dog " * 5
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    n_grams = len(text) - 7
    a = sorted(r.fp for r in winnow_fingerprints(df).collect())
    b = sorted(r.fp for r in winnow_fingerprints(df).collect())
    assert a == b
    assert 0 < len(a) <= n_grams * 2 // 4  # far below gram count


def test_winnow_short_and_null_docs_empty(spark):
    from sutro_spark.operators.dedup import winnow_fingerprints

    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "tiny"), (4, "elevenchars")],
        "doc_id long, text string",
    )
    out = winnow_fingerprints(df).collect()
    # only doc 4 has >= k + window - 1 = 11 chars -> exactly 1 full window
    assert {r.id for r in out} == {4}
    assert len(out) == 1


def test_winnow_validation(spark):
    import pytest as _pytest

    from sutro_spark.operators.dedup import winnow_fingerprints

    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with _pytest.raises(ValueError):
        winnow_fingerprints(df, k=0)


def test_winnow_dedup_keep_list(spark):
    # the winnow pipeline end-to-end: overlap pairs -> transitive
    # closure -> highest-score survivor per cluster; non-duplicates
    # survive as singletons
    from sutro_spark.operators.cluster import keep_best
    from sutro_spark.operators.dedup import winnow_overlap

    base = "the quick brown fox jumps over the lazy dog again and again"
    df = spark.createDataFrame(
        [
            (1, base),
            (2, base + " extended with more content"),  # near-dup of 1
            (3, "completely unrelated text about spark accumulators"),
        ],
        "doc_id long, text string",
    )
    pairs = winnow_overlap(df, min_shared=4).select("id_a", "id_b")
    kept = keep_best(df, pairs, F.length(F.coalesce("text", F.lit("")))).collect()
    by_cluster = {r.cluster_id: r for r in kept}
    assert len(by_cluster) == 2
    # cluster {1,2}: longer doc 2 wins; doc 3 is its own cluster
    assert by_cluster[1].kept_doc_id == 2
    assert by_cluster[1].cluster_size == 2
    assert by_cluster[3].kept_doc_id == 3
    assert by_cluster[3].cluster_size == 1


# ---------------------------------------------------------------------------
# trainable quality scorer (quality.train_linear_scorer)
# ---------------------------------------------------------------------------


def test_train_linear_scorer_separable(spark):
    # perfectly separable corpus: positives use one vocabulary,
    # negatives another -> after closed-form init + corrections the
    # scorer classifies a held-out doc from each class correctly
    from sutro_spark.operators.quality import (
        hashed_token_features,
        score_with_weights,
        train_linear_scorer,
    )

    rows = []
    for i in range(20):
        rows.append((i, "good clean prose with structure and meaning", 1))
        rows.append((100 + i, "zzz spam spam garbage noise zzz click here", -1))
    train = spark.createDataFrame(rows, "doc_id long, text string, y long")
    w = train_linear_scorer(train, F.col("y"), dim=256, epochs=2)
    held = spark.createDataFrame(
        [(900, "clean prose and meaning"), (901, "spam garbage click zzz")],
        "doc_id long, text string",
    )
    preds = {
        r.id: r.pred
        for r in score_with_weights(hashed_token_features(held, dim=256), w).collect()
    }
    assert preds[900] == 1
    assert preds[901] == -1
    # weights are exact integers
    assert all(isinstance(r.w, int) for r in w.collect())


def test_train_linear_scorer_epoch_correction(spark):
    # the correction epochs matter: a class-imbalanced corpus where the
    # shared token floods the closed-form init gets fixed by epoch 2
    from sutro_spark.operators.quality import train_linear_scorer

    rows = [(i, "common alpha", 1) for i in range(3)]
    rows += [(100 + i, "common beta", -1) for i in range(9)]
    df = spark.createDataFrame(rows, "doc_id long, text string, y long")
    w0 = {r.bucket: r.w for r in train_linear_scorer(df, F.col("y"), dim=64, epochs=0).collect()}
    w2 = {r.bucket: r.w for r in train_linear_scorer(df, F.col("y"), dim=64, epochs=2).collect()}
    # init: "common" weight = 3 - 9 = -6 < 0; corrections push the
    # positive-class tokens up
    assert w0 != w2
    assert min(w0.values()) < 0


def test_train_linear_scorer_validation(spark):
    import pytest as _pytest

    from sutro_spark.operators.quality import train_linear_scorer

    df = spark.createDataFrame([(1, "x", 1)], "doc_id long, text string, y long")
    with _pytest.raises(ValueError):
        train_linear_scorer(df, F.col("y"), epochs=-1)


# ---- Walsh-Hadamard perceptual hash (image_whash) -------------------


def _py_whash_from_bytes(payload: bytes) -> int:
    """Independent replay: stub grid (byte i -> cell i*64//n, byte sum)
    then the 2-D WHT sign hash by direct double loop (no numpy matrix
    multiply — genuinely different arithmetic path)."""
    n = len(payload)
    cells = [0] * 64
    for i, b in enumerate(payload):
        cells[i * 64 // n] += b
    h = 0
    for bit in range(1, 64):
        u, v = bit // 8, bit % 8
        co = 0
        for x in range(8):
            for y in range(8):
                sign = -1 if (bin(x & u).count("1") + bin(y & v).count("1")) % 2 else 1
                co += sign * cells[x * 8 + y]
        if co > 0:
            h |= 1 << (bit - 1)
    return h


def test_image_whash_matches_python_replay(spark):
    from sutro_spark.operators.multimodal import image_whash

    payloads = [b"spark walsh hadamard " * 7, b"a" * 100, b"\x01\xff" * 64]
    df = spark.createDataFrame(
        [(i, bytearray(p)) for i, p in enumerate(payloads)],
        "doc_id long, media binary",
    )
    got = {r["id"]: r["whash"] for r in image_whash(df).collect()}
    assert got == {i: _py_whash_from_bytes(p) for i, p in enumerate(payloads)}
    assert all(v >= 0 for v in got.values())  # bit 63 never set


def test_image_whash_brightness_invariant_on_aligned_grid(spark):
    """The frequency-hash property dHash doesn't have: a uniform
    brightness shift moves only the DC coefficient, so the 63 non-DC
    sign bits are unchanged. Exact under the stub grid when the
    payload length divides evenly into the 64 cells."""
    from sutro_spark.operators.multimodal import image_whash

    base = bytes((i * 37) % 200 for i in range(128))  # 2 bytes per cell
    brighter = bytes(b + 50 for b in base)
    df = spark.createDataFrame(
        [(0, bytearray(base)), (1, bytearray(brighter))],
        "doc_id long, media binary",
    )
    got = {r["id"]: r["whash"] for r in image_whash(df).collect()}
    assert got[0] == got[1] != 0


def test_image_whash_real_png_gated_on_pil(spark):
    """With PIL: a constant-luma real image has zero non-DC energy, so
    the sign hash is exactly 0. Without PIL: the stub grid hashes the
    PNG container bytes instead (same schema, honest fallback)."""
    from sutro_spark.operators.multimodal import image_whash

    png = _tiny_png(gray=180)
    df = spark.createDataFrame([(1, bytearray(png))], "doc_id long, media binary")
    got = image_whash(df).first()["whash"]
    try:
        import PIL  # noqa: F401

        assert got == 0
    except ImportError:
        assert got == _py_whash_from_bytes(png)


def test_whash_pairs_identical_images_pair_at_zero(spark):
    from sutro_spark.operators.multimodal import whash_pairs

    p = b"identical payload bytes " * 9
    df = spark.createDataFrame(
        [(1, bytearray(p)), (2, bytearray(p)), (3, bytearray(b"\x07" * 333))],
        "doc_id long, media binary",
    )
    pairs = {(r["id_a"], r["id_b"]): r["ham"] for r in whash_pairs(df).collect()}
    assert pairs.get((1, 2)) == 0
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_containment_catches_subset_jaccard_misses(spark):
    from sutro_spark.operators.dedup import containment_pairs, ngram_jaccard_pairs

    short = "the quick brown fox jumps over the lazy dog again and again"
    long = short + " " + " ".join(f"filler{i:04d} words" for i in range(60))
    df = spark.createDataFrame([(1, short), (2, long)], ["doc_id", "text"])
    cont = containment_pairs(df, threshold=0.8, max_df=None).collect()
    assert len(cont) == 1
    assert cont[0]["contained_id"] == 1  # the short doc is the subset
    assert cont[0]["containment"] >= 0.9
    # symmetric Jaccard scores the same pair far lower (union-normalized)
    jac = ngram_jaccard_pairs(df, threshold=0.0, max_df=None).collect()
    assert jac[0]["jaccard"] < 0.2


def test_containment_disjoint_texts_empty(spark):
    from sutro_spark.operators.dedup import containment_pairs

    df = spark.createDataFrame(
        [(1, "aaaa bbbb cccc dddd eeee"), (2, "zzzz yyyy xxxx wwww vvvv")],
        ["doc_id", "text"],
    )
    assert containment_pairs(df, threshold=0.3, max_df=None).count() == 0


def test_prefix_filter_is_lossless_vs_brute_force(spark):
    """The prefix-filter THEOREM: pair sets equal brute force exactly
    at the threshold — no probabilistic misses."""
    from sutro_spark.operators.dedup import prefix_filter_pairs

    docs = [
        (1, "alpha beta gamma delta epsilon"),
        (2, "alpha beta gamma delta zeta"),        # J=4/6 vs 1
        (3, "alpha beta gamma delta epsilon"),     # exact dup of 1
        (4, "one two three four five six"),
        (5, "one two three four five seven"),      # J=5/7 vs 4
        (6, "totally different words here now"),
        (7, "beta unrelated mixture nothing xyz"),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {
        (r["id_a"], r["id_b"]): r["jaccard_milli"]
        for r in prefix_filter_pairs(df, threshold_milli=600).collect()
    }
    # brute force over all 21 pairs
    import itertools

    sets = {i: set(t.split()) for i, t in docs}
    want = {}
    for a, b in itertools.combinations(sorted(sets), 2):
        inter = len(sets[a] & sets[b])
        union = len(sets[a] | sets[b])
        if 1000 * inter >= 600 * union:
            want[(a, b)] = 1000 * inter // union
    assert got == want
    assert (1, 3) in got and got[(1, 3)] == 1000
    assert (1, 2) in got and got[(1, 2)] == 666
    assert (4, 5) in got


def test_prefix_filter_validation(spark):
    import pytest

    from sutro_spark.operators.dedup import prefix_filter_pairs

    with pytest.raises(ValueError, match="threshold_milli"):
        prefix_filter_pairs(None, threshold_milli=0)


def test_prefix_filter_ppjoin_filters_stay_lossless(spark):
    """r10: the PPJoin length + positional filters prune candidates,
    never results — randomized brute-force equality across thresholds,
    with size-skewed docs (length-filter bait: a short doc sharing its
    rare prefix token with a long doc) and shared-prefix families
    (positional-filter bait)."""
    import itertools
    import random

    from sutro_spark.operators.dedup import prefix_filter_pairs

    rng = random.Random(10)
    vocab = [f"w{i}" for i in range(30)]
    docs = []
    for i in range(1, 25):
        n = rng.choice([3, 4, 5, 8, 12, 20])
        docs.append((i, " ".join(rng.sample(vocab, n))))
    # explicit bait: tiny doc sharing one rare token with a huge doc
    docs.append((100, "rareword w0 w1"))
    docs.append((101, "rareword " + " ".join(vocab[:25])))
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    sets = {i: set(t.split()) for i, t in docs}
    for t_milli in (400, 600, 900):
        got = {
            (r["id_a"], r["id_b"]): (r["inter"], r["jaccard_milli"])
            for r in prefix_filter_pairs(df, threshold_milli=t_milli).collect()
        }
        want = {}
        for a, b in itertools.combinations(sorted(sets), 2):
            inter = len(sets[a] & sets[b])
            union = len(sets[a] | sets[b])
            if union and 1000 * inter >= t_milli * union:
                want[(a, b)] = (inter, 1000 * inter // union)
        assert got == want, f"threshold {t_milli}"


def test_weighted_jaccard_sees_repetition_set_jaccard_collapses(spark):
    from collections import Counter

    from sutro_spark.operators.dedup import (
        ngram_jaccard_pairs,
        weighted_jaccard_pairs,
    )

    # A repeats the motif, B holds it once: identical as shingle SETS
    # (set-J = 1.0) but far apart as multisets
    a, b = "ababababab", "aba"
    df = spark.createDataFrame([(1, a), (2, b)], "doc_id long, text string")
    set_j = ngram_jaccard_pairs(df, k=2, threshold=0.0, max_df=None).collect()
    [wrow] = weighted_jaccard_pairs(
        df, k=2, threshold=0.0, max_df=None
    ).collect()
    ca = Counter(a[i : i + 2] for i in range(len(a) - 1))
    cb = Counter(b[i : i + 2] for i in range(len(b) - 1))
    inter = sum(min(ca[s], cb[s]) for s in set(ca) | set(cb))
    union = sum(max(ca[s], cb[s]) for s in set(ca) | set(cb))
    assert set_j[0]["jaccard"] == 1.0
    assert wrow["inter"] == inter
    assert wrow["ta"] == sum(ca.values()) and wrow["tb"] == sum(cb.values())
    assert abs(wrow["wjaccard"] - inter / union) < 1e-12
    assert wrow["wjaccard"] < 0.5  # repetition visible


def test_weighted_jaccard_df_cap_matches_universe_rule(spark):
    # a shingle shared by ALL docs is dropped by the cap; totals must
    # shrink accordingly (metric matches the joined universe)
    from sutro_spark.operators.dedup import weighted_jaccard_pairs

    df = spark.createDataFrame(
        [(i, "xy" + chr(97 + i) * 3) for i in range(5)],
        "doc_id long, text string",
    )
    rows = weighted_jaccard_pairs(df, k=2, threshold=0.0, max_df=4).collect()
    # "xy" appears in all 5 docs -> capped away; remaining shingles are
    # doc-unique so no pair shares anything
    assert rows == []


def test_bq_encode_packs_bits_exactly(spark):
    from sutro_spark.operators.similarity import bq_encode

    # thresholds 0 for 4 dims: bit d = floor(v_d * 2^20) > 0
    df = spark.createDataFrame(
        [(1, [1.0, -1.0, 0.5, 2.0]), (2, [-1.0, -1.0, -1.0, -1.0])],
        "vec_id long, embedding array<double>",
    )
    got = {
        r["id"]: (r["code_lo"], r["code_hi"])
        for r in bq_encode(df, [0, 0, 0, 0]).collect()
    }
    # vec 1: bits 0,2,3 set -> 1 + 4 + 8 = 13; vec 2: none
    assert got[1] == (13, 0)
    assert got[2] == (0, 0)


def test_bq_thresholds_floored_division_on_negative_sums(spark):
    from sutro_spark.operators.similarity import bq_thresholds

    # dim-0 sums to a negative non-multiple: floored div must round
    # toward -inf (DuckDB // semantics), NOT toward zero (Spark div)
    df = spark.createDataFrame(
        [(1, [-1.5, 1.0]), (2, [0.5, 1.0]), (3, [0.25, 1.0])],
        "vec_id long, embedding array<double>",
    )
    s = 1 << 20
    thr = bq_thresholds(df, dim=2, scale=s)
    total0 = sum(int(__import__("math").floor(x * s)) for x in (-1.5, 0.5, 0.25))
    assert thr[0] == total0 // 3  # python // floors — the contract
    assert thr[1] == s // 1  # constant dim: mean == value


def test_bq_topk_rescore_lever_and_guards(spark):
    import pytest as _pytest
    from pyspark.sql import functions as F

    from sutro_spark.operators.metrics import candidate_recall
    from sutro_spark.operators.similarity import (
        bq_encode,
        bq_topk,
        brute_force_topk,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = emb.where(F.col("vec_id") < 3)
    exact = brute_force_topk(emb, q, k=3)

    def rec(m):
        r = candidate_recall(
            exact,
            bq_topk(emb, q, k=3, rescore_multiple=m),
            keys=("query_id", "neighbor_id"),
        ).collect()[0]
        return r["recall"]

    # widening the rescore shortlist can only add candidates, so
    # recall is monotone in the multiple — the documented lever
    assert rec(8) >= rec(2)
    # raw Hamming view: k rows per query, hamming column present
    raw = bq_topk(emb, q, k=3, rescore_multiple=None)
    assert raw.columns == ["query_id", "neighbor_id", "hamming", "rank"]
    assert raw.count() == 3 * 3
    # wrong-dimension vectors fail loudly per row
    with _pytest.raises(ValueError):
        bq_encode(emb, [0] * 65)
    short = spark.createDataFrame(
        [(1, [1.0, 2.0])], "vec_id long, embedding array<double>"
    )
    with _pytest.raises(Exception, match="vector length"):
        bq_encode(short, [0, 0, 0]).collect()


def test_ivf_bq_full_probe_equals_exhaustive_bq(spark):
    """With nprobe == coarse_k every bucket is probed, so the IVF-BQ
    composition must return EXACTLY the exhaustive bq_topk result —
    the routing prunes candidates, never rescores them differently."""
    from pyspark.sql import functions as F

    from sutro_spark.operators.similarity import bq_topk, ivf_bq_topk

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = emb.where(F.col("vec_id") < 3)
    full = ivf_bq_topk(
        emb, q, k=3, coarse_k=4, coarse_iters=2, nprobe=4,
        rescore_multiple=4,
    )
    exhaustive = bq_topk(emb, q, k=3, rescore_multiple=4)
    rows = lambda df: sorted(
        (r["query_id"], r["neighbor_id"], r["sim"], r["rank"])
        for r in df.collect()
    )
    assert rows(full) == rows(exhaustive)


def test_ivf_bq_prune_monotone_and_raw_view(spark):
    """More probed buckets -> superset of CANDIDATES, so with an
    UNCUT shortlist (rescore_multiple covering every candidate) recall
    vs brute force is monotone in nprobe. At a FIXED shortlist budget
    it is NOT — extra bucket members can crowd the Hamming top-k·m and
    evict true neighbors the proxy ranks poorly (measured here:
    nprobe=4 at budget 12 scored BELOW nprobe=1 on this corpus) — the
    shortlist-crowding effect the operator docstring documents."""
    from pyspark.sql import functions as F

    from sutro_spark.operators.metrics import candidate_recall
    from sutro_spark.operators.similarity import (
        brute_force_topk,
        ivf_bq_topk,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = emb.where(F.col("vec_id") < 3)
    exact = brute_force_topk(emb, q, k=3)

    def rec(nprobe):
        r = candidate_recall(
            exact,
            ivf_bq_topk(
                emb, q, k=3, coarse_k=4, coarse_iters=2, nprobe=nprobe,
                # uncut: shortlist >= |corpus|, so the Hamming cut
                # never bites and candidate-set inclusion is the only
                # effect in play
                rescore_multiple=1000,
            ),
            keys=("query_id", "neighbor_id"),
        ).collect()[0]
        return r["recall"]

    assert rec(4) >= rec(1)
    assert rec(4) == 1.0  # full probe + uncut rescore == brute force
    raw = ivf_bq_topk(
        emb, q, k=3, coarse_k=4, nprobe=4, rescore_multiple=None
    )
    assert raw.columns == ["query_id", "neighbor_id", "hamming", "rank"]
    assert raw.count() == 3 * 3
