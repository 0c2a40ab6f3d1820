"""Quantized Lloyd k-means invariants (operators/kmeans.py)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from sutro_spark.operators.kmeans import (
    QVEC,
    assign_clusters,
    kmeans,
    kmeans_summary,
    quantize_embeddings,
)


@pytest.fixture(scope="module")
def embeddings(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def test_quantization_is_truncating_and_bounded(embeddings):
    q = quantize_embeddings(embeddings)
    row = q.select("embedding", QVEC).first()
    for x, qx in zip(row["embedding"], row[QVEC]):
        assert qx == int(float(x) * 1000) + 1000  # Python int() truncates too
        assert 0 <= qx <= 2000


def test_assignment_matches_numpy_argmin(embeddings):
    q = quantize_embeddings(embeddings).select("vec_id", QVEC)
    rows = q.orderBy("vec_id").collect()
    vecs = np.array([r[QVEC] for r in rows], dtype=np.int64)
    centroids = [(i, list(vecs[i])) for i in range(4)]
    got = {
        r["vec_id"]: (r["cluster"], r["dist2"])
        for r in assign_clusters(q, centroids).collect()
    }
    C = vecs[:4]
    for r, v in zip(rows, vecs):
        d = ((v[None, :] - C) ** 2).sum(axis=1)
        best = int(d.argmin())  # numpy argmin takes first minimum = our tie-break
        assert got[r["vec_id"]] == (best, int(d[best]))


def test_lloyd_iteration_does_not_increase_inertia(embeddings):
    a1, _ = kmeans(embeddings, k=8, iters=1)
    a2, cents = kmeans(embeddings, k=8, iters=2)
    i1 = kmeans_summary(a1).agg(F.sum("inertia")).first()[0]
    i2 = kmeans_summary(a2).agg(F.sum("inertia")).first()[0]
    assert i2 <= i1
    assert 1 <= len(cents) <= 8
    # every vector assigned exactly once
    assert a2.count() == embeddings.count()
    assert a2.select("vec_id").distinct().count() == embeddings.count()
