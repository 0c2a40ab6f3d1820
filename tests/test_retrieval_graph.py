"""BM25 ranked retrieval (functions/text.py bm25_topk) and the
deep-iteration/checkpointed use of operators/cluster.py pagerank:
exact-arithmetic checks against pure-Python replays of the same
integer recurrences, plus contract guards.
"""

import pytest
from pyspark.sql import functions as F


def _py_bm25(docs, queries, k=10, scale=1_000_000):
    """Pure-Python replay of bm25_topk's integer arithmetic."""
    toks = {i: t.lower().split() for i, t in docs}
    n_docs = len(docs)
    total = sum(len(v) for v in toks.values())
    out = []
    for qid, terms in queries:
        terms = [t.lower() for t in set(terms)]
        dfreq = {
            t: sum(1 for v in toks.values() if t in v) for t in terms
        }
        scores = {}
        for i, v in toks.items():
            s = 0
            dl = len(v)
            for t in terms:
                tf = v.count(t)
                if tf == 0 or dfreq[t] == 0:
                    continue
                dln = (1000 * dl * n_docs) // total
                sat = (22000 * tf * scale) // (10000 * tf + 3000 + 9 * dln)
                s += ((2 * n_docs - 2 * dfreq[t] + 1) * sat) // (
                    2 * dfreq[t] + 1
                )
            if s > 0:
                scores[i] = s
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        for r, (i, s) in enumerate(ranked, 1):
            out.append((qid, i, s, r))
    return out


def test_bm25_matches_python_replay(spark):
    docs = [
        (1, "spark join spark window"),
        (2, "join join join hash"),
        (3, "window scan filter"),
        (4, "spark"),
        (5, "hash hash window spark join agg scan"),
    ]
    queries = [(1, ["spark", "join"]), (2, ["window"])]
    from sutro_spark.functions.text import bm25_topk

    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = [
        (r.query_id, r.doc_id, r.score_scaled, r.rank)
        for r in bm25_topk(df, queries, k=3).collect()
    ]
    assert got == _py_bm25(docs, queries, k=3)


def test_bm25_large_term_set_path_equals_scan_path(spark):
    """scan_max_terms routes >threshold term sets through the broadcast
    terms-dim join; same inputs must produce the identical ranking —
    including when the query set carries terms absent from the corpus
    (they contribute nothing to either path)."""
    from sutro_spark.functions.text import bm25_topk

    docs = [
        (1, "spark join spark window"),
        (2, "join join join hash"),
        (3, "window scan filter"),
        (4, "spark"),
        (5, "hash hash window spark join agg scan"),
    ]
    queries = [
        (1, ["spark", "join", "absentterm"]),
        (2, ["window", "scan"]),
        (3, ["hash"]),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")

    def run(threshold):
        return [
            (r.query_id, r.doc_id, r.score_scaled, r.rank)
            for r in bm25_topk(df, queries, k=4, scan_max_terms=threshold).collect()
        ]

    small = run(128)   # literal-array in-scan filter
    large = run(1)     # broadcast terms-dim join
    assert small == large
    assert small == _py_bm25(docs, queries, k=4)


def test_bm25_requires_terms(spark):
    from sutro_spark.functions.text import bm25_topk

    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        bm25_topk(df, [])
    with pytest.raises(ValueError):
        bm25_topk(df, [(1, [])])


def _py_pagerank(edges, iters, scale=10**12, damping_pct=85,
                 redistribute_dangling=False):
    """Replay of operators/cluster.py pagerank's integer update."""
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    n = len(nodes)
    deg = {}
    for s, _ in edges:
        deg[s] = deg.get(s, 0) + 1
    base = (100 - damping_pct) * scale // (100 * n)
    rank = {u: scale // n for u in nodes}
    for _ in range(iters):
        share = 0
        if redistribute_dangling:
            share = sum(rank[u] for u in nodes if u not in deg) // n
        sums = {}
        for s, d in edges:
            sums[d] = sums.get(d, 0) + rank[s] // deg[s]
        rank = {
            u: base + (damping_pct * (sums.get(u, 0) + share)) // 100
            for u in nodes
        }
    return rank


def test_pagerank_deep_checkpointed_matches_replay(spark):
    # a hub (0), a cycle (1->2->3->1), a dangling sink (4), and a
    # duplicate (parallel) edge 1->2 to pin multi-edge semantics.
    # checkpoint=True exercises the lineage-cut path q_pagerank uses
    # at 6+ iterations.
    edges = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 2), (2, 3), (3, 1), (3, 4)]
    from sutro_spark.operators.cluster import pagerank

    e = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r.node: r["rank"]
        for r in pagerank(e, iters=7, checkpoint=True).collect()
    }
    assert got == _py_pagerank(edges, 7)


def test_pagerank_dangling_redistribution_matches_replay(spark):
    # node 4 is a dangling sink: with redistribution its held mass is
    # split uniformly each round instead of draining; exact integer
    # match against the python replay, and total mass strictly higher
    # than the draining default.
    edges = [(0, 1), (0, 2), (1, 2), (2, 3), (3, 4)]
    from sutro_spark.operators.cluster import pagerank

    e = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r.node: r["rank"]
        for r in pagerank(e, iters=5, redistribute_dangling=True).collect()
    }
    assert got == _py_pagerank(edges, 5, redistribute_dangling=True)
    drained = {
        r.node: r["rank"] for r in pagerank(e, iters=5).collect()
    }
    assert sum(got.values()) > sum(drained.values())


def test_pagerank_leaf_holds_base_only_in_star(spark):
    # star: everyone points at 0; leaves have no in-edges, so after
    # iteration 1 each leaf holds exactly the teleport/base term.
    from sutro_spark.operators.cluster import pagerank

    edges = [(i, 0) for i in range(1, 6)]
    e = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r["rank"] for r in pagerank(e, iters=4).collect()}
    base = (15 * 10**12) // (100 * 6)
    for leaf in range(1, 6):
        assert got[leaf] == base
    assert got[0] > got[1]
