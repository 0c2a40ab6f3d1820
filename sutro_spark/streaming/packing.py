"""Incremental (streaming) context packing — the online twin of
``operators/packing.py::ffd_pack``, the way ``streaming_mg`` twins the
batch Misra–Gries fold.

A stream cannot globally sort by size, so the online variant is plain
FIRST-FIT over arrival order with a BOUNDED set of open bins per
shard: each arriving doc goes into the lowest-numbered open bin with
room, else opens a new bin; when the open set exceeds ``open_bins``
the FULLEST bin (ties → smallest bin id) closes and is forgotten.
Divergences from the batch operator, stated: no decreasing sort —
first-fit guarantees ≤ 1.7·OPT asymptotically (Dósa & Sgall 2013)
where FFD's offline bound is 11/9·OPT + 6/9; and closing a bin early
forfeits any space a later small doc could have used, so waste also
grows as ``open_bins`` shrinks — that knob trades state size against
fill, the honest trade an infinite stream forces.

State per shard: ≤ ``open_bins`` (bin id, fill) pairs plus a bin
counter — shards·open_bins rows TOTAL, constant in stream length and
doc count (the property that keeps an infinite stream runnable; a
streaming groupBy assignment table would grow without bound). Docs
are hash-sharded by id so each shard's packing is independent and
deterministic given Spark's micro-batch order; the parity test
replays the same per-file batch sequence in pure Python
(test_streaming_sketches.py discipline).

Output per trigger: one row per doc — (shard, id, n_tokens, bin);
bin = -1 flags docs over budget (the batch (-1, -1) convention).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["streaming_ffd", "ffd_state_update"]


def ffd_state_update(budget: int, open_bins: int):
    """State function for :func:`streaming_ffd`: online first-fit over
    arrival order against the shard's open-bin fill list."""
    import pandas as pd

    def _update(key, batches, state):
        (shard,) = key
        if state.exists:
            bin_ids, fills, nxt = state.get
            bins = list(zip(list(bin_ids), [int(f) for f in fills]))
            nxt = int(nxt)
        else:
            bins, nxt = [], 0
        out_id, out_tok, out_bin = [], [], []
        # one trigger = one packing round in ID ORDER: row delivery
        # order after the groupBy exchange is not deterministic, so
        # sorting pins the first-fit sequence (and the replay test)
        chunks = [pdf for pdf in batches if len(pdf)]
        merged = (
            pd.concat(chunks).sort_values("id") if chunks else pd.DataFrame()
        )
        if len(merged):
            for doc, tok in zip(merged["id"], merged["n_tokens"]):
                tok = int(tok)
                if tok > budget:  # over-budget: flag, never packed
                    out_id.append(doc)
                    out_tok.append(tok)
                    out_bin.append(-1)
                    continue
                placed = None
                for i, (b, f) in enumerate(bins):  # first fit: bin order
                    if f + tok <= budget:
                        bins[i] = (b, f + tok)
                        placed = b
                        break
                if placed is None:
                    placed = nxt
                    bins.append((nxt, tok))
                    nxt += 1
                    if len(bins) > open_bins:
                        # close the fullest (ties -> smallest bin id)
                        bins.remove(max(bins, key=lambda t: (t[1], -t[0])))
                out_id.append(doc)
                out_tok.append(tok)
                out_bin.append(placed)
        state.update(
            ([b for b, _ in bins], [f for _, f in bins], nxt)
        )
        yield pd.DataFrame(
            {
                "shard": [shard] * len(out_id),
                "id": out_id,
                "n_tokens": out_tok,
                "bin": out_bin,
            }
        )

    return _update


def streaming_ffd(
    stream: DataFrame,
    text_column: str = "text",
    id_column: str = "doc_id",
    *,
    budget: int = 96,
    shards: int = 4,
    open_bins: int = 8,
    salt: str = "ffd",
) -> DataFrame:
    """Incrementally maintained online first-fit packing over a stream
    (see module docstring for the offline-FFD divergences and the
    open_bins waste/state trade).

    Output per trigger: (shard, id, n_tokens, bin) — bin ids are
    unique per shard; global bin identity is (shard, bin).
    """
    from pyspark.sql import types as T
    from pyspark.sql.streaming.state import GroupStateTimeout

    from sutro_spark.functions.sampling import hash_bucket
    from sutro_spark.functions.text import token_count

    if open_bins < 1:
        raise ValueError(f"open_bins must be >= 1, got {open_bins}")
    out_schema = T.StructType(
        [
            T.StructField("shard", T.LongType()),
            T.StructField("id", T.LongType()),
            T.StructField("n_tokens", T.LongType()),
            T.StructField("bin", T.LongType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("bin_ids", T.ArrayType(T.LongType())),
            T.StructField("fills", T.ArrayType(T.LongType())),
            T.StructField("next_bin", T.LongType()),
        ]
    )
    keyed = stream.where(F.col(id_column).isNotNull()).select(
        hash_bucket(
            F.col(id_column).cast("string"), salt=salt, buckets=shards
        )
        .cast("long")
        .alias("shard"),
        F.col(id_column).cast("long").alias("id"),
        token_count(F.col(text_column)).alias("n_tokens"),
    )
    return keyed.groupBy("shard").applyInPandasWithState(
        ffd_state_update(budget, open_bins),
        out_schema,
        state_schema,
        "update",
        GroupStateTimeout.NoTimeout,
    )
