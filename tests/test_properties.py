"""Property-based checks (hypothesis): operator semantics vs a plain
Python model on adversarial strings (nulls, unicode, whitespace)."""

from hypothesis import given, settings, strategies as st

from pyspark.sql import functions as F

from sutro_spark.functions.prompt import concat_prompt
from sutro_spark.functions.text import token_count
from sutro_spark.operators.unpack import unpack_json_outputs

texts = st.one_of(
    st.none(),
    st.text(
        alphabet=st.characters(blacklist_categories=("Cs",)), max_size=40
    ),
)


@settings(max_examples=5, deadline=None)
@given(st.lists(st.tuples(texts, texts), min_size=1, max_size=8))
def test_concat_prompt_matches_python_model(spark, rows):
    df = spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(rows)], "id long, a string, b string"
    )
    out = {
        r["id"]: r["p"]
        for r in df.select("id", concat_prompt(df, ["<", "a", "|", "b", ">"]).alias("p")).collect()
    }
    for i, (a, b) in enumerate(rows):
        expected = f"<{a or ''}|{b or ''}>"
        assert out[i] == expected


@settings(max_examples=5, deadline=None)
@given(st.lists(st.text(alphabet=" \t\na bc", max_size=30), min_size=1, max_size=8))
def test_token_count_matches_python_split(spark, rows):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(rows)], "id long, t string")
    out = {r["id"]: r["n"] for r in df.select("id", token_count(F.col("t")).alias("n")).collect()}
    for i, t in enumerate(rows):
        assert out[i] == len(t.split())


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.dictionaries(
            st.sampled_from(["x", "y", "z"]),
            st.one_of(st.integers(-1000, 1000), st.text(max_size=10)),
            min_size=1,
            max_size=3,
        ),
        min_size=1,
        max_size=6,
    )
)
def test_unpack_roundtrips_json(spark, dicts):
    import json

    # normalize: all rows carry the same key set (schema comes from row 0)
    keys = sorted({k for d in dicts for k in d})
    norm = [{k: d.get(k) for k in keys} for d in dicts]
    schema = {
        "type": "object",
        "properties": {
            k: {"type": "integer" if all(isinstance(d[k], int) or d[k] is None for d in norm) else "string"}
            for k in keys
        },
    }
    df = spark.createDataFrame(
        [(i, json.dumps(d)) for i, d in enumerate(norm)], "id long, outputs string"
    )
    out = unpack_json_outputs(df, "outputs", schema)
    got = {r["id"]: {k: r[k] for k in keys} for r in out.collect()}
    for i, d in enumerate(norm):
        for k in keys:
            expect = d[k]
            actual = got[i][k]
            if isinstance(expect, int) and not all(
                isinstance(x[k], int) or x[k] is None for x in norm
            ):
                expect = str(expect)  # mixed column coerced to string schema
            if isinstance(expect, str) and isinstance(actual, str):
                assert actual == expect
            else:
                assert actual == expect


@settings(max_examples=5, deadline=None)
@given(
    st.lists(  # base rows: (key, payload)
        st.tuples(st.integers(0, 15), st.integers(0, 99)),
        min_size=0, max_size=10, unique_by=lambda t: t[0],
    ),
    st.lists(  # changes: (key, payload, op, version); unique (key, op,
        # version) — an exact tie has no defined winner in either engine
        st.tuples(
            st.integers(0, 15), st.integers(0, 99),
            st.sampled_from(["I", "U", "D"]), st.integers(1, 4),
        ),
        min_size=0, max_size=12, unique_by=lambda t: (t[0], t[2], t[3]),
    ),
)
def test_merge_upsert_matches_python_model(spark, base_rows, change_rows):
    from sutro_spark.operators.cdc import merge_upsert

    base = spark.createDataFrame(base_rows + [(999, 0)], "k long, x long")
    changes = spark.createDataFrame(
        change_rows + [(998, 0, "U", 1)], "k long, x long, op string, v long"
    )
    got = {r["k"]: r["x"] for r in merge_upsert(base, changes, ["k"], order_column="v").collect()}

    # python model: latest (v desc, op desc) change per key wins
    model = {k: x for k, x in base_rows + [(999, 0)]}
    winners = {}
    for k, x, op, v in change_rows + [(998, 0, "U", 1)]:
        if k not in winners or (v, op) > (winners[k][0], winners[k][1]):
            winners[k] = (v, op, x)
    for k, (v, op, x) in winners.items():
        if op == "D":
            model.pop(k, None)
        else:
            model[k] = x
    assert got == model


def test_shuffled_shards_deterministic_and_complete(spark):
    from sutro_spark.operators.packing import shuffled_shards

    df = spark.createDataFrame([(i,) for i in range(500)], "doc_id long")
    a = shuffled_shards(df, "doc_id", num_shards=8)
    rows = a.collect()
    assert len(rows) == 500
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append(r["position"])
    # every shard's positions are exactly 1..n (dense rank, no gaps)
    for shard, ps in by_shard.items():
        assert sorted(ps) == list(range(1, len(ps) + 1))
    # repartitioning the input must not change any address
    b = {(r["doc_id"], r["shard"], r["position"])
         for r in shuffled_shards(df.repartition(13), "doc_id", num_shards=8).collect()}
    assert {(r["doc_id"], r["shard"], r["position"]) for r in rows} == b


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.lists(st.sampled_from("abcd"), min_size=0, max_size=12).map(" ".join),
        min_size=1,
        max_size=6,
    )
)
def test_passage_strip_invariants(spark, docs):
    """ExactSubstr invariants vs a Python model on tiny alphabets
    (heavy duplication by construction): every duplicated k-window is
    flagged, exactly one canonical occurrence survives corpus-wide, and
    n_kept + n_removed == n_tokens for every doc."""
    from sutro_spark.operators.passages import dup_passage_stats, strip_dup_passages

    k = 3
    df = spark.createDataFrame(list(enumerate(docs)), "doc_id long, text string")
    toks = {i: t.split() for i, t in enumerate(docs)}
    occ: dict = {}
    for i, ts in toks.items():
        for p in range(len(ts) - k + 1):
            occ.setdefault(tuple(ts[p : p + k]), []).append((i, p))

    stats = {r.doc_id: r for r in dup_passage_stats(df, k=k).collect()}
    for i, ts in toks.items():
        n_windows = max(len(ts) - k + 1, 0)
        n_dup = sum(
            1
            for p in range(n_windows)
            if len(occ[tuple(ts[p : p + k])]) > 1
        )
        assert stats[i].n_windows == n_windows
        assert stats[i].n_dup_windows == n_dup

    strip = {r.doc_id: r for r in strip_dup_passages(df, k=k).collect()}
    removed_model: dict = {i: set() for i in toks}
    for positions in occ.values():
        if len(positions) > 1:
            for (i, p) in sorted(positions)[1:]:
                removed_model[i].update(range(p, p + k))
    for i, ts in toks.items():
        kept = [t for p, t in enumerate(ts) if p not in removed_model[i]]
        assert strip[i].clean_text == " ".join(kept)
        assert strip[i].n_kept + strip[i].n_removed == strip[i].n_tokens == len(ts)


def _py_hash32(salt: str, key: str) -> int:
    import hashlib

    return int(hashlib.sha256(f"{salt}:{key}".encode()).hexdigest()[:8], 16)


@settings(max_examples=5, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=30), min_size=1, max_size=40))
def test_cms_matches_python_model(spark, keys):
    """Third-implementation agreement: the CMS cells must equal a plain
    Python model of the documented recipe (sha256 prefix mod width)."""
    from collections import Counter

    from sutro_spark.functions.sketches import cms_counts

    df = spark.createDataFrame([(str(k),) for k in keys], "k string")
    got = {
        (r.row, r.bucket): r.cnt
        for r in cms_counts(df, "k", depth=2, width=32).collect()
    }
    model: Counter = Counter()
    for k in keys:
        for r in range(2):
            model[(r, _py_hash32(f"cms{r}", str(k)) % (1 << 32) % 32)] += 1
    assert got == dict(model)


@settings(max_examples=5, deadline=None)
@given(st.sets(st.integers(min_value=0, max_value=10000), min_size=1, max_size=60))
def test_hll_registers_match_python_model(spark, keys):
    from sutro_spark.functions.sketches import hll_registers

    df = spark.createDataFrame([("g", str(k)) for k in keys], "g string, k string")
    got = {(r.j, r.M) for r in hll_registers(df, "g", "k", p=6).collect()}
    regs: dict = {}
    for k in keys:
        h = _py_hash32("hll", str(k)) % (1 << 32)
        j, rem = h % 64, h >> 6
        rho = 27 if rem == 0 else 27 - rem.bit_length()
        regs[j] = max(regs.get(j, 0), rho)
    assert got == set(regs.items())


@settings(max_examples=3, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.text(alphabet="ab cdef", min_size=1, max_size=20),
            st.sampled_from([1, -1]),
        ),
        min_size=1,
        max_size=6,
    )
)
def test_train_scorer_init_matches_python_model(spark, rows):
    # closed-form init (epochs=0): w[b] = sum_i y_i * cnt_ib — checked
    # against a plain-Python hashed-count model on adversarial strings
    import hashlib

    from sutro_spark.operators.quality import train_linear_scorer

    df = spark.createDataFrame(
        [(i, t, y) for i, (t, y) in enumerate(rows)],
        "doc_id long, text string, y long",
    )
    got = {
        r.bucket: r.w
        for r in train_linear_scorer(df, F.col("y"), dim=64, epochs=0).collect()
    }
    expected: dict[int, int] = {}
    for t, y in rows:
        for tok in t.lower().strip().split():
            b = int(hashlib.sha256(tok.encode()).hexdigest()[:4], 16) % 64
            expected[b] = expected.get(b, 0) + y
    assert got == expected


@settings(max_examples=10, deadline=None)
@given(
    docs=st.lists(
        st.sets(st.sampled_from("abcdefgh"), min_size=1, max_size=8),
        min_size=2,
        max_size=6,
    ),
    threshold_milli=st.sampled_from([250, 333, 500, 600, 750, 1000]),
)
def test_prefix_filter_lossless_at_threshold_boundary(
    spark, docs, threshold_milli
):
    """r11 (VERDICT #6): the PPJoin length + positional filters must be
    LOSSLESS exactly at the J == t boundary — token sets drawn from an
    8-letter alphabet land on 1000*inter == t*union constantly (e.g.
    inter 1 / union 2 at t=500, inter 3 / union 4 at t=750), pinning
    the >=-vs-> edge of dedup.py's req/length/positional tests forever."""
    from sutro_spark.operators.dedup import prefix_filter_pairs

    rows = [(i, " ".join(sorted(s))) for i, s in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.id_a, r.id_b)
        for r in prefix_filter_pairs(
            df, threshold_milli=threshold_milli
        ).collect()
    }
    want = set()
    for i in range(len(docs)):
        for j in range(i + 1, len(docs)):
            inter = len(docs[i] & docs[j])
            union = len(docs[i] | docs[j])
            if 1000 * inter >= threshold_milli * union:
                want.add((i, j))
    assert got == want


def test_prefix_filter_exact_boundary_fixtures(spark):
    """Hand-built exact-equality cases (1000*inter == t*union) — each
    MUST be emitted; the same case one token worse MUST NOT."""
    from sutro_spark.operators.dedup import prefix_filter_pairs

    # t=500: {a b} vs {b} -> inter 1, union 2, J = 0.500 exactly
    # t=750: {a b c} vs {a b c d} -> inter 3, union 4, J = 0.750
    # t=333: {a x} vs {a y} -> inter 1, union 3, J = 0.333... just ABOVE
    #        333/1000 (1000*1 >= 333*3 = 999) -> kept
    cases = [
        (500, ["a b", "b"], True),
        (500, ["a b c", "b"], False),          # J = 1/3 < 0.5
        (750, ["a b c", "a b c d"], True),
        (750, ["a b c", "a b c d e"], False),  # J = 3/5 < 0.75
        (333, ["a x", "a y"], True),
        (1000, ["a b", "a b"], True),          # J = 1 at t = 1
        (1000, ["a b", "a b c"], False),
    ]
    for t, texts, expect in cases:
        df = spark.createDataFrame(
            list(enumerate(texts)), "doc_id long, text string"
        )
        n = prefix_filter_pairs(df, threshold_milli=t).count()
        assert n == (1 if expect else 0), (t, texts, n)


@settings(max_examples=5, deadline=None)
@given(
    st.lists(st.integers(0, 20), min_size=1, max_size=24),
    st.sampled_from([4, 8, 24]),
)
def test_ffd_pack_matches_python_first_fit(spark, sizes, group_size):
    # blocked FFD vs a plain Python replay: identical (grp, bin) for
    # every doc, including ties (broken by doc_id) and the overlong flag
    from sutro_spark.operators.packing import ffd_pack

    budget = 12
    df = spark.createDataFrame(
        [(i, "w " * n) for i, n in enumerate(sizes)], "doc_id long, text string"
    )
    out = {
        r["doc_id"]: (r["grp"], r["bin"])
        for r in ffd_pack(df, budget=budget, group_size=group_size).collect()
    }
    eligible = sorted(
        ((n, i) for i, n in enumerate(sizes) if n <= budget),
        key=lambda t: (-t[0], t[1]),
    )
    expected = {i: (-1, -1) for i, n in enumerate(sizes) if n > budget}
    for g in range(0, len(eligible), group_size):
        fills: list = []
        for n, i in eligible[g : g + group_size]:
            for j, fill in enumerate(fills):
                if fill + n <= budget:
                    fills[j] = fill + n
                    expected[i] = (g // group_size, j)
                    break
            else:
                expected[i] = (g // group_size, len(fills))
                fills.append(n)
    assert out == expected


@settings(max_examples=5, deadline=None)
@given(
    st.lists(st.integers(0, 6), min_size=1, max_size=40),
    st.integers(1, 4),
)
def test_mg_bound_holds_on_random_streams(spark, keys, k):
    # exact MG mergeability properties on arbitrary multisets: never
    # overestimates, worst underestimate <= n/(k+1), <= k survivors
    from pyspark.sql import functions as F

    from sutro_spark.functions.sketches import mg_heavy_hitters

    df = spark.createDataFrame(
        [(i, key) for i, key in enumerate(keys)], "rid long, key long"
    )
    out = {
        r["key"]: r["est"]
        for r in mg_heavy_hitters(df, "key", "rid", k=k, buckets=4).collect()
    }
    from collections import Counter

    exact = Counter(str(key) for key in keys)
    n = len(keys)
    assert len(out) <= k
    assert all(est <= exact[key] for key, est in out.items())
    assert max(exact[key] - out.get(key, 0) for key in exact) <= n // (k + 1)
