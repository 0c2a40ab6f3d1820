"""Ranked-retrieval metrics (MRR/hit@k), calibration (bins + ECE),
blocklist tagging, and incremental rollup maintenance."""

import pytest
from pyspark.sql import functions as F

from sutro_spark.functions.text import keyword_hits
from sutro_spark.operators.cdc import incremental_rollup
from sutro_spark.operators.metrics import (
    calibration_bins,
    calibration_ece,
    rank_metrics,
)


def test_rank_metrics_known_values(spark):
    # q1: truth {a, b}; ranked hits first at rank 2 -> rr 1/2
    # q2: truth {c};    ranked hit at rank 1        -> rr 1
    # q3: truth {d};    never retrieved             -> rr 0
    truth = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "c"), (3, "d")],
        "query_id int, neighbor_id string",
    )
    ranked = spark.createDataFrame(
        [(1, "x", 1), (1, "b", 2), (1, "a", 3), (2, "c", 1), (3, "y", 1)],
        "query_id int, neighbor_id string, rank int",
    )
    row = rank_metrics(truth, ranked, k=3).collect()[0]
    assert row.n_queries == 3 and row.n_hit == 2
    assert row.hit_rate == pytest.approx(2 / 3)
    # MRR = (1/2 + 1 + 0) / 3 = 1/2, computed as (3+6+0)/(6*3)
    assert row.mrr == pytest.approx(0.5)


def test_rank_metrics_k_cap_excludes_late_hits(spark):
    truth = spark.createDataFrame([(1, "a")], "query_id int, neighbor_id string")
    ranked = spark.createDataFrame(
        [(1, "a", 5)], "query_id int, neighbor_id string, rank int"
    )
    row = rank_metrics(truth, ranked, k=3).collect()[0]
    assert row.n_hit == 0 and row.mrr == 0.0


def test_rank_metrics_k_bounds():
    # k > 25 is rejected: lcm(1..k) scaling would let the reciprocal-rank
    # sum wrap a BIGINT at realistic query counts (lcm(1..42) ~ 2.19e17
    # overflows after ~43 rank-1 queries).
    with pytest.raises(ValueError):
        rank_metrics(None, None, k=26)
    with pytest.raises(ValueError):
        rank_metrics(None, None, k=0)


def test_calibration_known_ece(spark):
    # bin 9 (conf 900, 2 rows, 1 correct): |1000*1 - 1800| = 800
    # bin 0 (conf 50, 2 rows, 0 correct): |0 - 100| = 100
    # ECE = (800 + 100) / (1000 * 4) = 0.225
    df = spark.createDataFrame(
        [
            ("x", "x", 900),
            ("x", "y", 900),
            ("x", "y", 50),
            ("x", "y", 50),
        ],
        "label string, pred string, conf_milli int",
    )
    bins = {r.bin: r for r in calibration_bins(df).collect()}
    assert set(bins) == {0, 9}
    assert bins[9].n == 2 and bins[9].correct == 1 and bins[9].gap_scaled == 800
    assert bins[9].accuracy == pytest.approx(0.5)
    assert bins[9].avg_conf == pytest.approx(0.9)
    row = calibration_ece(df).collect()[0]
    assert row.n == 4 and row.gap_total == 900
    assert row.ece == pytest.approx(0.225)


def test_calibration_conf_1000_lands_in_top_bin(spark):
    df = spark.createDataFrame(
        [("x", "x", 1000)], "label string, pred string, conf_milli int"
    )
    rows = calibration_bins(df).collect()
    assert len(rows) == 1 and rows[0].bin == 9


def test_calibration_null_and_out_of_range_conf(spark):
    # NULL confidences are dropped (no phantom top-bin rows skewing
    # avg_conf); out-of-range confidences clamp into [0, bins-1]
    # instead of minting a negative bin id.
    df = spark.createDataFrame(
        [
            ("x", "x", 900),
            ("x", "y", None),   # dropped
            ("x", "x", -50),    # clamps to bin 0
            ("x", "y", 1500),   # clamps to bin 9
        ],
        "label string, pred string, conf_milli int",
    )
    bins = {r.bin: r for r in calibration_bins(df).collect()}
    assert set(bins) == {0, 9}
    assert bins[0].n == 1 and bins[9].n == 2
    row = calibration_ece(df).collect()[0]
    assert row.n == 3


def test_keyword_hits_empty_terms(spark):
    df = spark.createDataFrame(
        [(1, "anything at all"), (2, None)], "doc_id int, text string"
    )
    rows = {r.id: r for r in keyword_hits(df, []).collect()}
    assert rows.keys() == {1, 2}
    for r in rows.values():
        assert (r.n_hits, r.n_terms, r.flagged) == (0, 0, 0)
    # threshold 0 means every doc trivially flags, even with no terms
    assert all(r.flagged == 1 for r in keyword_hits(df, [], threshold=0).collect())


def test_keyword_hits_scan_and_join_paths_agree(spark):
    df = spark.createDataFrame(
        [
            (1, "Spam! spam and MORE spam today"),
            (2, "perfectly clean document text"),
            (3, None),
        ],
        "doc_id int, text string",
    )
    terms = ["spam", "legacy"]
    scan = keyword_hits(df, terms, threshold=3)
    join = keyword_hits(df, terms, threshold=3, scan_max_terms=0)
    srows = {r.id: r for r in scan.collect()}
    jrows = {r.id: r for r in join.collect()}
    assert srows.keys() == jrows.keys() == {1, 2, 3}
    for k in srows:
        assert (srows[k].n_hits, srows[k].n_terms, srows[k].flagged) == (
            jrows[k].n_hits,
            jrows[k].n_terms,
            jrows[k].flagged,
        )
    assert srows[1].n_hits == 3 and srows[1].n_terms == 1 and srows[1].flagged == 1
    assert srows[2].n_hits == 0 and srows[2].flagged == 0
    assert srows[3].n_hits == 0


def test_incremental_rollup_matches_recompute(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    base = orders.where(F.col("o_orderkey") % 5 != 0)
    rollup = base.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(cents).cast("long").alias("cents"),
    )
    inserts = orders.where(F.col("o_orderkey") % 5 == 0).select(
        "o_orderpriority", cents.alias("v"), F.lit(1).alias("op")
    )
    deletes = base.where(F.col("o_orderkey") % 7 == 0).select(
        "o_orderpriority", cents.alias("v"), F.lit(-1).alias("op")
    )
    got = {
        r.o_orderpriority: (r.n, r.cents)
        for r in incremental_rollup(
            rollup, inserts.unionByName(deletes), ["o_orderpriority"], {"cents": "v"}
        ).collect()
    }
    expect = {
        r.o_orderpriority: (r.n, r.cents)
        for r in orders.where(
            (F.col("o_orderkey") % 5 == 0)
            | ((F.col("o_orderkey") % 5 != 0) & (F.col("o_orderkey") % 7 != 0))
        )
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(cents).cast("long").alias("cents"),
        )
        .collect()
    }
    assert got == expect


def test_incremental_rollup_drops_emptied_groups(spark):
    rollup = spark.createDataFrame([("a", 2, 10), ("b", 1, 5)], "k string, n long, s long")
    changes = spark.createDataFrame(
        [("a", 4, -1), ("a", 6, -1)], "k string, v long, op int"
    )
    rows = incremental_rollup(rollup, changes, ["k"], {"s": "v"}).collect()
    assert {r.k: (r.n, r.s) for r in rows} == {"b": (1, 5)}


def test_incremental_rollup_strict_surfaces_negative_counts(spark):
    # A delete for a key the rollup never saw is a CDC consistency
    # violation: default mode masks it (dropped with the zeros);
    # strict mode keeps the negative-count group so a maintenance job
    # can assert and alert.
    rollup = spark.createDataFrame([("a", 1, 10)], "k string, n long, s long")
    changes = spark.createDataFrame(
        [("ghost", 3, -1), ("a", 10, 1)], "k string, v long, op int"
    )
    default = {
        r.k: (r.n, r.s)
        for r in incremental_rollup(rollup, changes, ["k"], {"s": "v"}).collect()
    }
    assert default == {"a": (2, 20)}
    strict = {
        r.k: (r.n, r.s)
        for r in incremental_rollup(
            rollup, changes, ["k"], {"s": "v"}, strict=True
        ).collect()
    }
    assert strict == {"a": (2, 20), "ghost": (-1, -3)}


def test_confidence_milli_exact_and_null(spark):
    from sutro_spark.operators.results import confidence_milli, exp_confidence

    df = spark.createDataFrame(
        [(1, 0.0), (2, -1.0), (3, -5.0), (4, None)],
        "id int, cumulative_logprobs double",
    )
    rows = {r.id: r.conf_milli for r in confidence_milli(df).collect()}
    # 1_000_000 div (1000 + 1000*|lp|): 0 -> 1000, -1 -> 500, -5 -> 166
    assert rows == {1: 1000, 2: 500, 3: 166, 4: None}
    e = {r.id: r.confidence_score for r in exp_confidence(df).collect()}
    assert e[1] == 1.0 and abs(e[2] - 0.36787944117144233) < 1e-15
    assert e[4] is None


def test_classify_calibration_loop_detects_miscalibrated_stub(spark):
    """label -> judge -> calibration report, closed: a stub whose
    confidence is always high but whose accuracy is 0 must surface
    ECE ~= its average confidence."""
    from sutro_spark.operators.metrics import calibration_ece
    from sutro_spark.operators.results import confidence_milli
    from sutro_spark.operators.templates import classify

    # 12 short docs; gold label deliberately NEVER equals the stub's
    # length-keyed prediction (gold rotated by +1 from the stub rule)
    classes = ["news", "blog", "code"]
    rows = [(i, "x" * (10 + i)) for i in range(12)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = confidence_milli(classify(df, classes, "text", include_logprobs=True))
    from pyspark.sql import functions as FF

    gold = FF.element_at(
        FF.array(*[FF.lit(c) for c in classes]),
        ((FF.length("text") + 1) % 3 + 1).cast("int"),
    )
    preds = out.select(
        gold.alias("label"),
        FF.col("classification").alias("pred"),
        "conf_milli",
    )
    row = calibration_ece(preds).collect()[0]
    assert row.n == 12
    # accuracy is 0 everywhere, so ECE == mean confidence; short docs
    # -> conf_milli ~= 1_000_000/(1000+~150..210) ~ 830+, i.e. badly
    # miscalibrated and the report says so
    assert row.ece > 0.8
    # sanity: the confidences really were high (the miscalibration is
    # confident-wrong, not unconfident-wrong)
    assert all(r.conf_milli > 800 for r in out.select("conf_milli").collect())


def test_precision_threshold_picks_least_strict(spark):
    from sutro_spark.operators.metrics import precision_threshold

    # scores 3,2,1: precision at >=3 is 1.0 (2/2), at >=2 is 3/4,
    # at >=1 is 3/6. target 750 -> least strict qualifying cutoff is 2.
    rows = [(3, 1), (3, 1), (2, 1), (2, 0), (1, 0), (1, 0)]
    df = spark.createDataFrame(rows, ["score", "label"])
    r = precision_threshold(df, target_milli=750).collect()
    assert len(r) == 1
    r = r[0]
    assert r["threshold"] == 2
    assert (r["kept_n"], r["kept_tp"]) == (4, 3)
    assert r["precision_milli"] == 750
    assert (r["total_n"], r["total_tp"]) == (6, 3)


def test_precision_threshold_unreachable_is_empty(spark):
    from sutro_spark.operators.metrics import precision_threshold

    df = spark.createDataFrame([(1, 0), (2, 0)], ["score", "label"])
    assert precision_threshold(df, target_milli=500).count() == 0


def test_precision_threshold_validation(spark):
    import pytest

    from sutro_spark.operators.metrics import precision_threshold

    with pytest.raises(ValueError, match="target_milli"):
        precision_threshold(None, target_milli=0)


def test_precision_threshold_rejects_fractional_scores(spark):
    """Raw 0-1 float probabilities must raise, not silently truncate
    to 0 and collapse every cutoff into one."""
    import pytest

    from sutro_spark.operators.metrics import precision_threshold

    df = spark.createDataFrame(
        [(0.9, 1), (0.7, 1), (0.2, 0)], ["score", "label"]
    )
    with pytest.raises(Exception, match="milli-scaled"):
        precision_threshold(df, target_milli=750).collect()
    # integral doubles are fine (5.0 == 5): same answer as longs
    ok = spark.createDataFrame(
        [(3.0, 1), (2.0, 1), (1.0, 0)], ["score", "label"]
    )
    assert precision_threshold(ok, target_milli=900).first()["threshold"] == 2


def test_fleiss_kappa_matches_closed_form(spark):
    from collections import Counter

    from sutro_spark.operators.metrics import fleiss_kappa

    labels = {
        1: ["a", "a", "b"], 2: ["a", "a", "a"], 3: ["b", "b", "b"],
        4: ["a", "b", "c"], 5: ["c", "c", "b"], 6: ["a", "a", "b"],
        7: ["b", "b", "b"], 8: ["c", "c", "c"],
    }
    rows = [(i, j, c) for i, ls in labels.items() for j, c in enumerate(ls)]
    df = spark.createDataFrame(rows, ["item", "rater", "category"])
    got = fleiss_kappa(df).first()
    N, n = len(labels), 3
    S2 = sum(sum(v * v for v in Counter(ls).values()) for ls in labels.values())
    C = sum(
        v * v
        for v in Counter(c for ls in labels.values() for c in ls).values()
    )
    a, b, d = S2 - N * n, N * n * (n - 1), (N * n) ** 2
    assert got["kappa"] == (a * d - C * b) / (b * (d - C))
    assert got["n_items_excluded"] == 0


def test_fleiss_kappa_excludes_nonconforming_items(spark):
    from sutro_spark.operators.metrics import fleiss_kappa

    rows = [(1, 0, "a"), (1, 1, "a"), (2, 0, "a"), (2, 1, "b"),
            (3, 0, "a")]  # item 3 has only one rater
    got = fleiss_kappa(spark.createDataFrame(rows, ["item", "rater", "category"])).first()
    assert got["n_items"] == 2 and got["n_items_excluded"] == 1


def test_fleiss_kappa_perfect_agreement_single_category_null(spark):
    from sutro_spark.operators.metrics import fleiss_kappa

    rows = [(i, j, "a") for i in range(4) for j in range(3)]
    got = fleiss_kappa(spark.createDataFrame(rows, ["item", "rater", "category"])).first()
    assert got["kappa"] is None  # P_e = 1: chance correction undefined


def test_vocab_richness_closed_form(spark):
    from sutro_spark.functions.text import vocab_richness

    # tokens: a a b b c -> N=5 D=3 f1=1 f2=2
    # chao1 = 3 + 1*0/(2*3) = 3.0 ; gt = 1/5 = 0.2
    docs = spark.createDataFrame([("a a b b",), ("c!",)], "text string")
    row = vocab_richness(docs).collect()[0]
    assert (row.n_tokens, row.n_types, row.f1, row.f2) == (5, 3, 1, 2)
    assert row.chao1 == 3.0
    assert row.gt_unseen_mass == 0.2


def test_vocab_richness_no_doubletons(spark):
    from sutro_spark.functions.text import vocab_richness

    # all singletons: f2=0 must not blow up (bias-corrected form)
    # D=3 f1=3 -> chao1 = 3 + 3*2/2 = 6.0 ; gt mass = 1.0
    docs = spark.createDataFrame([("a b c",)], "text string")
    row = vocab_richness(docs).collect()[0]
    assert (row.n_tokens, row.n_types, row.f1, row.f2) == (3, 3, 3, 0)
    assert row.chao1 == 6.0
    assert row.gt_unseen_mass == 1.0


def test_vocab_richness_empty_corpus(spark):
    from sutro_spark.functions.text import vocab_richness

    docs = spark.createDataFrame([("",), (None,)], "text string")
    row = vocab_richness(docs).collect()[0]
    assert (row.n_tokens, row.n_types, row.f1, row.f2) == (0, 0, 0, 0)
    assert row.chao1 == 0.0
    assert row.gt_unseen_mass is None


def test_yule_k_closed_form(spark):
    from sutro_spark.functions.text import yule_k

    # tokens: a a a b b c -> counts 3,2,1; N=6, S2=9+4+1=14
    # K = 1e4*(14-6)/36 = 2222.22...
    docs = spark.createDataFrame([("a a a b,b c",)], ["text"])
    row = yule_k(docs).first()
    assert (row["n_tokens"], row["n_types"], row["s2"]) == (6, 3, 14)
    assert row["yule_k"] == 10000.0 * 8 / 36


def test_yule_k_all_distinct_is_zero(spark):
    from sutro_spark.functions.text import yule_k

    # every token unique: S2 = N -> K = 0 (no repetition)
    docs = spark.createDataFrame([("one two three four",)], ["text"])
    row = yule_k(docs).first()
    assert row["s2"] == row["n_tokens"] == 4
    assert row["yule_k"] == 0.0


def test_yule_k_empty_corpus(spark):
    from sutro_spark.functions.text import yule_k

    docs = spark.createDataFrame([("",), (None,)], ["text"])
    row = yule_k(docs).first()
    assert (row["n_tokens"], row["n_types"], row["s2"]) == (0, 0, 0)
    assert row["yule_k"] is None


def test_unigram_surprisal_closed_form(spark):
    from sutro_spark.functions.text import unigram_surprisal

    # corpus: doc1 = "a a b", doc2 = "a c"; counts a:3, b:1, c:1, N=5
    # bits: a -> floor(log2(5/3)) = 0; b,c -> floor(log2 5) = 2
    docs = spark.createDataFrame(
        [(1, "a a b"), (2, "a c")], ["doc_id", "text"]
    )
    rows = {
        r["doc_id"]: r
        for r in unigram_surprisal(docs).collect()
    }
    assert rows[1]["n_tokens"] == 3
    assert rows[1]["surprisal_bits"] == 0 + 0 + 2
    assert rows[1]["bpt_milli"] == 2000 // 3
    assert rows[2]["n_tokens"] == 2
    assert rows[2]["surprisal_bits"] == 0 + 2
    assert rows[2]["bpt_milli"] == 1000


def test_unigram_surprisal_boilerplate_scores_low(spark):
    from sutro_spark.functions.text import unigram_surprisal

    # 9 copies of boilerplate + 1 unique doc: the unique doc's
    # bits/token must dominate every boilerplate copy's
    docs = spark.createDataFrame(
        [(i, "the same page text again") for i in range(9)]
        + [(99, "zyx qwv unique jargon")],
        ["doc_id", "text"],
    )
    rows = {r["doc_id"]: r["bpt_milli"] for r in unigram_surprisal(docs).collect()}
    assert all(rows[99] > rows[i] for i in range(9))
    # tokenless docs are absent, not zero-rowed
    empty = spark.createDataFrame([(1, "..."), (2, "ok")], ["doc_id", "text"])
    got = unigram_surprisal(empty).collect()
    assert [r["doc_id"] for r in got] == [2]


def test_krippendorff_alpha_closed_form(spark):
    from fractions import Fraction

    from sutro_spark.operators.metrics import krippendorff_alpha

    # item 1: x,x,y (m=3, A=4); item 2: x,x (m=2, A=0);
    # item 3: y,y,y,z (m=4, A=6); item 4: one vote -> excluded
    rows = [
        (1, "a", "x"), (1, "b", "x"), (1, "c", "y"),
        (2, "a", "x"), (2, "b", "x"),
        (3, "a", "y"), (3, "b", "y"), (3, "c", "y"), (3, "d", "z"),
        (4, "a", "x"),
    ]
    df = spark.createDataFrame(rows, ["item", "rater", "category"])
    r = krippendorff_alpha(df).first()
    assert (r["n_items"], r["n_values"], r["n_items_excluded"]) == (3, 9, 1)
    assert r["n_categories"] == 3
    # closed form: D_o = (4/2 + 0/1 + 6/3)/9 = 4/9
    # T = {x:4, y:4, z:1}; D_e = (4*5+4*5+1*8)/(9*8) = 48/72 = 2/3
    # alpha = 1 - (4/9)/(2/3) = 1/3
    want = 1 - Fraction(4, 9) / Fraction(2, 3)
    assert r["alpha"] == float(want) == pytest.approx(1 / 3)
    assert r["s_scaled"] == 4 * 1260 + 0 + 6 * 840
    assert r["e_sum"] == 48


def test_krippendorff_alpha_perfect_and_degenerate(spark):
    from sutro_spark.operators.metrics import krippendorff_alpha

    # perfect agreement at varying rater counts -> alpha = 1
    perfect = spark.createDataFrame(
        [(1, "a", "x"), (1, "b", "x"), (2, "a", "y"), (2, "b", "y"), (2, "c", "y")],
        ["item", "rater", "category"],
    )
    assert krippendorff_alpha(perfect).first()["alpha"] == 1.0
    # single category everywhere -> D_e = 0 -> NULL
    degen = spark.createDataFrame(
        [(1, "a", "x"), (1, "b", "x")], ["item", "rater", "category"]
    )
    assert krippendorff_alpha(degen).first()["alpha"] is None


def test_krippendorff_alpha_guards(spark):
    from sutro_spark.operators.metrics import krippendorff_alpha

    with pytest.raises(ValueError, match="max_raters"):
        krippendorff_alpha(None, max_raters=11)
    # an item with > max_raters votes raises in-plan, not silently
    crowd = spark.createDataFrame(
        [(1, f"r{i}", "x" if i else "y") for i in range(4)],
        ["item", "rater", "category"],
    )
    with pytest.raises(Exception, match="max_raters=3"):
        krippendorff_alpha(crowd, max_raters=3).collect()


def test_readability_profile_closed_form(spark):
    from sutro_spark.functions.text import readability_profile

    # "The cat sat. It ran away!" -> 2 sentences, 6 words,
    # syllables (vowel groups): e,a,a,i,a,a+ay -> the=1 cat=1 sat=1
    # it=1 ran=1 away=2 -> 7
    df = spark.createDataFrame(
        [(1, "The cat sat. It ran away!")], ["doc_id", "text"]
    )
    r = readability_profile(df).first()
    assert (r["n_sentences"], r["n_words"], r["n_syllables"]) == (2, 6, 7)
    # 206835 - (1015*6) div 2 - (84600*7) div 6 = 206835 - 3045 - 98700
    assert r["flesch_milli"] == 206835 - 3045 - 98700


def test_readability_profile_degenerate(spark):
    from sutro_spark.functions.text import readability_profile

    df = spark.createDataFrame(
        [(1, ""), (2, None), (3, "...")], ["doc_id", "text"]
    )
    for r in readability_profile(df).collect():
        assert r["flesch_milli"] is None
        assert r["n_words"] == 0


def test_average_precision_closed_form(spark):
    from sutro_spark.operators.metrics import average_precision

    truth = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "c"), (3, "d")],
        "query_id int, neighbor_id string",
    )
    ranked = spark.createDataFrame(
        [(1, "x", 1), (1, "b", 2), (1, "a", 3), (2, "c", 1), (3, "y", 1)],
        "query_id int, neighbor_id string, rank int",
    )
    r = average_precision(truth, ranked, k=3).first()
    # q1: hits at p=2 (prec 1/2) and p=3 (prec 2/3) -> AP = 7/12
    # q2: AP = 1; q3: AP = 0 -> MAP = 19/36 = 0.52777...
    assert (r["n_queries"], r["n_hit_queries"]) == (3, 2)
    assert r["map_milli"] == 527
    assert abs(r["mean_ap"] - 19 / 36) < 1e-5


def test_average_precision_bounds_and_empty(spark):
    import pytest

    from sutro_spark.operators.metrics import average_precision

    with pytest.raises(ValueError):
        average_precision(None, None, k=26)
    truth = spark.createDataFrame([(1, "a")], "query_id int, neighbor_id string")
    ranked = spark.createDataFrame([], "query_id int, neighbor_id string, rank int")
    r = average_precision(truth, ranked, k=5).first()
    assert (r["n_queries"], r["n_hit_queries"], r["map_milli"]) == (1, 0, 0)


def test_krippendorff_alpha_dedupes_replayed_votes(spark):
    """ADVICE r9: a replayed identical (item, rater, category) vote
    counts once — duplicating every row leaves alpha unchanged."""
    from sutro_spark.operators.metrics import krippendorff_alpha

    rows = [
        (1, "r1", "a"), (1, "r2", "a"), (1, "r3", "b"),
        (2, "r1", "b"), (2, "r2", "b"),
        (3, "r1", "a"), (3, "r2", "b"), (3, "r3", "a"), (3, "r4", "a"),
    ]
    df = spark.createDataFrame(rows, ["item", "rater", "category"])
    base = krippendorff_alpha(df).collect()[0]
    doubled = krippendorff_alpha(df.union(df)).collect()[0]
    assert doubled["n_values"] == base["n_values"]
    assert doubled["alpha"] == base["alpha"]


def test_average_precision_dedupes_repeated_items(spark):
    """ADVICE r9: the same (query, item) at several ranks <= k scores
    once, at its best rank."""
    from sutro_spark.operators.metrics import average_precision

    truth = spark.createDataFrame([(1, 10)], ["query_id", "neighbor_id"])
    clean = spark.createDataFrame(
        [(1, 10, 2)], ["query_id", "neighbor_id", "rank"]
    )
    dup = spark.createDataFrame(
        [(1, 10, 2), (1, 10, 3)], ["query_id", "neighbor_id", "rank"]
    )
    a = average_precision(truth, clean, k=5).collect()[0]
    b = average_precision(truth, dup, k=5).collect()[0]
    assert (a["map_milli"], a["mean_ap"]) == (b["map_milli"], b["mean_ap"])
    # best rank wins: adding a rank-1 duplicate improves AP to 1.0
    best = spark.createDataFrame(
        [(1, 10, 1), (1, 10, 4)], ["query_id", "neighbor_id", "rank"]
    )
    c = average_precision(truth, best, k=5).collect()[0]
    assert c["mean_ap"] == 1.0


# --- pass@k (Chen et al. 2021) and self-consistency -----------------------


def test_pass_at_k_known_values(spark):
    from math import comb

    from sutro_spark.operators.metrics import pass_at_k

    # problem 1: n=6, c=2; problem 2: n=6, c=0; problem 3: n=6, c=6
    rows = []
    for p, c in [(1, 2), (2, 0), (3, 6)]:
        rows += [(p, i < c) for i in range(6)]
    df = spark.createDataFrame(rows, "problem_id long, correct boolean")
    out = {r["problem"]: r for r in pass_at_k(df, k=3).collect()}
    for p, c in [(1, 2), (2, 0), (3, 6)]:
        expected = 1.0 - comb(6 - c, 3) / comb(6, 3)
        assert abs(out[p]["pass_at_k"] - expected) < 1e-12
        assert out[p]["pass_micro"] == 10**6 - (10**6 * comb(6 - c, 3)) // comb(6, 3)
    # fewer than k samples -> excluded
    small = spark.createDataFrame([(9, True)], "problem_id long, correct boolean")
    assert pass_at_k(small, k=3).count() == 0


def test_pass_at_k_unbiased_vs_empirical_subsample(spark):
    # the estimator equals the average over ALL C(n,k) subsets of
    # whether the subset contains a correct sample — check by brute
    # force on one problem
    from itertools import combinations

    from sutro_spark.operators.metrics import pass_at_k

    n, c, k = 7, 3, 4
    df = spark.createDataFrame(
        [(1, i < c) for i in range(n)], "problem_id long, correct boolean"
    )
    got = pass_at_k(df, k=k).collect()[0]["pass_at_k"]
    flags = [i < c for i in range(n)]
    subsets = list(combinations(range(n), k))
    brute = sum(any(flags[i] for i in s) for s in subsets) / len(subsets)
    assert abs(got - brute) < 1e-12


def test_pass_at_k_validates_k(spark):
    import pytest as _pytest

    from sutro_spark.operators.metrics import pass_at_k

    df = spark.createDataFrame([(1, True)], "problem_id long, correct boolean")
    with _pytest.raises(ValueError):
        pass_at_k(df, k=0)
    with _pytest.raises(ValueError):
        pass_at_k(df, k=17)


def test_pass_at_k_envelope_raises_not_nulls(spark):
    """A problem whose n exceeds the DECIMAL(38,0) envelope (which for
    pass_micro is the TIGHTER (n)_k < 10^32 bound — the micro scales
    the factorial by 10^6) raises loudly instead of silently nulling
    the row out of the summary mean (VERDICT r12 / ADVICE r12)."""
    import pytest as _pytest

    from sutro_spark.operators.metrics import (
        _pass_envelope_max_n,
        pass_at_k,
    )

    k = 16
    n_max = _pass_envelope_max_n(k)
    assert n_max == 107  # (107)_16 * 1e6 < 1e38 < (108)_16 * 1e6
    # n = n_max is fine...
    ok = spark.createDataFrame(
        [(1, i == 0) for i in range(n_max)], "problem_id long, correct boolean"
    )
    row = pass_at_k(ok, k=k).collect()[0]
    assert row["pass_micro"] is not None and 0 < row["pass_micro"] < 10**6
    # ...n = n_max + 1 raises (would have been a silent NULL before)
    over = spark.createDataFrame(
        [(1, i == 0) for i in range(n_max + 1)],
        "problem_id long, correct boolean",
    )
    with _pytest.raises(Exception, match="DECIMAL\\(38,0\\) envelope"):
        pass_at_k(over, k=k).collect()


def test_pass_at_k_summary_surfaces_dropped(spark):
    """Problems with n < k are not silently narrowed out of the mean:
    the summary carries n_dropped (VERDICT r12 'no silent caps')."""
    from sutro_spark.operators.metrics import pass_at_k_summary

    rows = [(1, i < 2) for i in range(6)]  # kept: n=6
    rows += [(2, True), (2, False)]  # dropped: n=2 < k=3
    rows += [(3, True)]  # dropped: n=1
    df = spark.createDataFrame(rows, "problem_id long, correct boolean")
    s = pass_at_k_summary(df, k=3).collect()[0]
    assert (s["n_problems"], s["n_dropped"]) == (1, 2)
    assert s["mean_pass_micro"] == 800000  # only problem 1's micro
    # empty input: zeros, not nulls, for the counters
    empty = spark.createDataFrame([], "problem_id long, correct boolean")
    e = pass_at_k_summary(empty, k=3).collect()[0]
    assert (e["n_problems"], e["n_saturated"], e["n_dropped"]) == (0, 0, 0)
    assert e["mean_pass_micro"] is None


def test_majority_vote_ties_break_lexicographically(spark):
    from sutro_spark.operators.metrics import majority_vote_accuracy

    samples = spark.createDataFrame(
        [(1, "b"), (1, "a"), (1, "c"), (1, "a"), (1, "b"),  # tie a/b -> a
         (2, "x"), (2, "x"), (2, "y")],
        "problem_id long, answer string",
    )
    gold = spark.createDataFrame(
        [(1, "a"), (2, "y")], "problem_id long, gold string"
    )
    row = majority_vote_accuracy(samples, gold).collect()[0]
    assert row["n_problems"] == 2
    assert row["n_correct"] == 1  # problem 1 tie -> 'a' correct; 2 -> 'x' wrong
    assert row["accuracy_milli"] == 500
    assert abs(row["accuracy"] - 0.5) < 1e-12


# --- NDCG (Järvelin & Kekäläinen 2002) -----------------------------------


def test_ndcg_known_values(spark):
    from math import log2

    from sutro_spark.operators.metrics import _ndcg_discounts, ndcg

    # query 1: judged items 10(g3), 11(g2), 12(g1); ranked 11@1, 10@2,
    # 99@3 (unjudged). DCG = 3*d1 + 7*d2; IDCG = 7*d1 + 3*d2 + 1*d3.
    judged = spark.createDataFrame(
        [(1, 10, 3), (1, 11, 2), (1, 12, 1)],
        "query_id long, item_id long, grade long",
    )
    ranked = spark.createDataFrame(
        [(1, 11, 1), (1, 10, 2), (1, 99, 3)],
        "query_id long, item_id long, rank long",
    )
    d = _ndcg_discounts(10)
    row = ndcg(judged, ranked, k=10).collect()[0]
    dcg = 3 * d[0] + 7 * d[1]
    idcg = 7 * d[0] + 3 * d[1] + 1 * d[2]
    assert (row["dcg_micro"], row["idcg_micro"]) == (dcg, idcg)
    assert row["ndcg_micro"] == (1000000 * dcg) // idcg
    assert abs(row["ndcg"] - dcg / idcg) < 1e-15
    # discounts really are micro-scaled 1/log2(i+1)
    for i, dm in enumerate(d, start=1):
        assert abs(dm - 1_000_000 / log2(i + 1)) <= 0.5


def test_ndcg_best_rank_and_max_grade_dedup(spark):
    from sutro_spark.operators.metrics import _ndcg_discounts, ndcg

    # duplicate judgments keep MAX grade; duplicate ranks keep BEST
    judged = spark.createDataFrame(
        [(1, 10, 1), (1, 10, 3)], "query_id long, item_id long, grade long"
    )
    ranked = spark.createDataFrame(
        [(1, 10, 4), (1, 10, 2)], "query_id long, item_id long, rank long"
    )
    d = _ndcg_discounts(5)
    row = ndcg(judged, ranked, k=5).collect()[0]
    assert row["dcg_micro"] == 7 * d[1]  # grade 3 at rank 2
    assert row["idcg_micro"] == 7 * d[0]


def test_ndcg_zero_ideal_counted_not_dropped(spark):
    from sutro_spark.operators.metrics import ndcg, ndcg_summary

    judged = spark.createDataFrame(
        [(1, 10, 2), (2, 20, 0)],  # query 2: all grade 0 -> IDCG 0
        "query_id long, item_id long, grade long",
    )
    ranked = spark.createDataFrame(
        [(1, 10, 1), (2, 20, 1)], "query_id long, item_id long, rank long"
    )
    per = {r["query"]: r for r in ndcg(judged, ranked, k=5).collect()}
    assert per[1]["ndcg"] == 1.0
    assert per[2]["idcg_micro"] == 0 and per[2]["ndcg"] is None
    s = ndcg_summary(judged, ranked, k=5).collect()[0]
    assert (s["n_queries"], s["n_zero_ideal"]) == (1, 1)
    assert s["mean_ndcg_micro"] == 1000000


def test_ndcg_validates_bounds(spark):
    import pytest as _pytest

    from sutro_spark.operators.metrics import ndcg

    judged = spark.createDataFrame(
        [(1, 10, 19)], "query_id long, item_id long, grade long"
    )
    ranked = spark.createDataFrame(
        [(1, 10, 1)], "query_id long, item_id long, rank long"
    )
    with _pytest.raises(ValueError):
        ndcg(judged, ranked, k=0)
    with _pytest.raises(ValueError):
        ndcg(judged, ranked, k=26)
    # grade 19 raises at runtime (exact-envelope guard), never wraps
    with _pytest.raises(Exception, match="outside \\[0, 18\\]"):
        ndcg(judged, ranked, k=5).collect()


def test_ndcg_negative_rank_raises_null_rank_drops(spark):
    # r13 advice: rank < 1 must raise_error (element_at would silently
    # index the discount table from the END); NULL ranks drop like
    # NULL grades do
    import pytest as _pytest

    from sutro_spark.operators.metrics import ndcg

    judged = spark.createDataFrame(
        [(1, 10, 2), (1, 11, 1)], "query_id long, item_id long, grade long"
    )
    bad = spark.createDataFrame(
        [(1, 10, -1)], "query_id long, item_id long, rank long"
    )
    with _pytest.raises(Exception, match="ranks are 1-based"):
        ndcg(judged, bad, k=5).collect()
    with_null = spark.createDataFrame(
        [(1, 10, 1), (1, 11, None)],
        "query_id long, item_id long, rank long",
    )
    per = {r["query"]: r for r in ndcg(judged, with_null, k=5).collect()}
    # item 11's NULL rank dropped: dcg counts only item 10 (gain 3,
    # rank-1 discount 1.0) while idcg has both judged items
    assert per[1]["dcg_micro"] == 3 * 1_000_000


def test_ndcg_null_grades_dropped_not_raised(spark):
    from sutro_spark.operators.metrics import ndcg

    judged = spark.createDataFrame(
        [(1, 10, 2), (1, 11, None), (2, 20, None)],
        "query_id long, item_id long, grade long",
    )
    ranked = spark.createDataFrame(
        [(1, 10, 1), (2, 20, 1)], "query_id long, item_id long, rank long"
    )
    per = {r["query"]: r for r in ndcg(judged, ranked, k=5).collect()}
    assert per[1]["ndcg"] == 1.0  # the NULL judgment on item 11 is gone
    assert 2 not in per  # query 2 had ONLY a null judgment -> no query row
