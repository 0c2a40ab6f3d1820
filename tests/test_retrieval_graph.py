"""BM25 ranked retrieval (functions/text.py bm25_topk) and PageRank
(operators/graph.py pagerank): exact-arithmetic checks against pure-
Python replays of the same integer recurrences, plus contract guards.
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


def test_bm25_requires_terms(spark):
    from sutro_spark.functions.text import bm25_topk

    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        bm25_topk(df, [])
    with pytest.raises(ValueError):
        bm25_topk(df, [(1, [])])


def _py_pagerank(edges, iterations, scale=10**12, num=17, den=20):
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    n = len(nodes)
    outdeg = {}
    for s, _ in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    teleport = ((den - num) * scale) // (den * n)
    rank = {u: scale // n for u in nodes}
    for _ in range(iterations):
        sums = {}
        for s, d in edges:
            sums[d] = sums.get(d, 0) + rank[s] // outdeg[s]
        rank = {u: teleport + (num * sums.get(u, 0)) // den for u in nodes}
    return rank


def test_pagerank_matches_python_replay(spark):
    # a hub (0), a cycle (1->2->3->1), a dangling sink (4), and a
    # duplicate (parallel) edge 1->2 to pin multi-edge semantics.
    edges = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 2), (2, 3), (3, 1), (3, 4)]
    from sutro_spark.operators.graph import pagerank

    e = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r.node: r.rank_scaled for r in pagerank(e, iterations=7).collect()
    }
    assert got == _py_pagerank(edges, 7)


def test_pagerank_sink_gets_teleport_only_in_star(spark):
    # star: everyone points at 0; leaves have no in-edges, so after
    # iteration 1 each leaf holds exactly the teleport term.
    from sutro_spark.operators.graph import pagerank

    edges = [(i, 0) for i in range(1, 6)]
    e = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.rank_scaled for r in pagerank(e, iterations=4).collect()}
    teleport = (3 * 10**12) // (20 * 6)
    for leaf in range(1, 6):
        assert got[leaf] == teleport
    assert got[0] > got[1]


def test_pagerank_validates_args(spark):
    from sutro_spark.operators.graph import pagerank

    e = spark.createDataFrame([(0, 1)], "src long, dst long")
    with pytest.raises(ValueError):
        pagerank(e, iterations=0)
    with pytest.raises(ValueError):
        pagerank(e, damping_num=21)
