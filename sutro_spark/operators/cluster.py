"""Duplicate-cluster formation: candidate pairs → connected components
→ one representative per cluster.

This is the step after every near-dup candidate generator in this repo
(minhash_lsh_pairs / simhash_pairs / rh_lsh_dedup_pairs): pairwise
"A duplicates B" edges must be closed transitively before you can keep
one document per group — keeping "the first of each pair" both
over-deletes (B dup of A, C dup of B but not of A) and under-deletes.

Algorithm: alternating **large-star / small-star** (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC 2014) — the
standard shuffle-based CC algorithm:

- large-star(u): attach every neighbor v > u to min(N(u) ∪ {u});
- small-star(u): attach every neighbor of u (edges oriented high→low)
  plus u itself to min(N(u) ∪ {u}).

Both steps are a groupBy(min) + an equi-join — two shuffles per round,
no collect, no per-node adjacency lists (the min is computed with an
aggregate, never `collect_list`, so a 10⁹-degree hub node costs a
map-side-combinable min, not an OOM). Converges in O(log² n) rounds to
star graphs rooted at each component's minimum node; near-dup graphs
(small diameter) converge in 2-3 rounds. Lineage is truncated every
round with an eager localCheckpoint so the plan does not grow with the
iteration count.

The reference has no clustering operator (its dedup story ends at the
SDK boundary); this extends SURVEY.md §2's dedup suite the way a
training-data pipeline needs at 100 TB.
"""

from __future__ import annotations

from sutro_spark.session import barrier as _barrier
from pyspark.sql import DataFrame, Observation, Window
from pyspark.sql import functions as F

from sutro_spark.session import release_local_checkpoint


def _large_star(edges: DataFrame) -> DataFrame:
    """Emit (v, m) for every neighbor v > u, where m = min(N(u) ∪ {u}).

    r16 optimization round: m comes from ``min(v) over (partition by
    u)`` — ONE exchange on u — instead of a groupBy(u) + join back,
    which shuffled the edge set twice (the aggregate's exchange and
    the probe side's; their payloads differ so Catalyst cannot reuse
    one for the other). Identical output rows: the window min over the
    whole u-group is exactly the joined ``mins`` value. A mega-degree
    hub key buffers its group in WindowExec's spillable row array
    (disk-backed, not an OOM) — the trade accepted for halving every
    CC round's exchange count."""
    sym = edges.union(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    w = Window.partitionBy("u")
    return (
        sym.withColumn("m", F.least(F.min("v").over(w), F.col("u")))
        .where(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Orient edges high→low, then attach every low neighbor and u
    itself to m = min(N(u) ∪ {u}).

    Same one-exchange window shape as :func:`_large_star`. Both output
    legs — (neighbor, m) and (u, m) — come from ONE explode above the
    window (a union of two selects would evaluate the window subtree
    twice; exchange reuse does not extend to Window nodes). The selves
    leg is thereby emitted once PER EDGE (not per node) — the caller's
    ``.distinct()`` collapses the duplicates, and the round's row SET
    is exactly the groupBy+join formulation's (the only consumer is
    connected_components, which distincts every round; u != m always
    holds because m < u by orientation)."""
    o = (
        edges.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        )
        .where(F.col("u") != F.col("v"))
    )
    w = Window.partitionBy("u")
    om = o.withColumn("m", F.min("v").over(w))  # m < u by orientation
    return (
        om.select(
            F.explode(
                F.array(
                    F.struct(F.col("v").alias("u"), F.col("m").alias("v")),
                    F.struct(F.col("u").alias("u"), F.col("m").alias("v")),
                )
            ).alias("e")
        )
        .select("e.u", "e.v")
        .where(F.col("u") != F.col("v"))
    )


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    *,
    max_iter: int = 50,
) -> DataFrame:
    """(node, component) for every node that shares a component with at
    least one other node; component = min node id of the component.
    Singletons (nodes absent from ``edges``) are simply absent — join
    with a left-coalesce to label them with their own id.
    """
    e = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .where(F.col(src).isNotNull() & F.col(dst).isNotNull())
        .where(F.col(src) != F.col(dst))
        .distinct()
    )
    # r16: checkpoint BEFORE round 1, not just after it — large-star
    # reads its input up to 4× (e ∪ swap feeds both the min-aggregate
    # and the join), so the caller's pair-generation lineage (a winnow
    # or simhash candidate join) would otherwise replay 4× in the
    # first round
    if not e.isStreaming:
        e = e.transform(_barrier)
    prev_sig = None
    prev_ckpt = e
    for _ in range(max_iter):
        # r17 (guide §5 driver discipline): the convergence signature
        # rides the checkpoint's own materialization job via
        # observe() — metrics fire on eager localCheckpoint AND on the
        # reliable checkpoint() path (verified both) — instead of a
        # second full scan-and-aggregate job per round: one
        # driver-synchronized job per CC round, not two. Same rows,
        # same (n, h) values, identical convergence decisions.
        obs = Observation()
        e = (
            _small_star(_large_star(e))
            .distinct()
            .observe(
                obs,
                F.count(F.lit(1)).alias("n"),
                # decimal accumulator: a long sum of 2^63-range hashes
                # overflows under ANSI mode
                F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")).alias("h"),
            )
            .transform(_barrier)
        )
        # the new eager checkpoint is materialized; the superseded
        # round's blocks can never be read again — free them so a
        # long-lived session doesn't pin O(iterations) partitions
        if prev_ckpt is not None:
            release_local_checkpoint(prev_ckpt)
        prev_ckpt = e
        row = obs.get
        sig = (row["n"], row["h"])
        if sig == prev_sig:
            break
        prev_sig = sig
    # Converged: every edge is (node, root) with root = component min.
    return e.select(F.col("u").alias("node"), F.col("v").alias("component"))


def pagerank(
    edges: DataFrame,
    *,
    iters: int = 2,
    damping_pct: int = 85,
    scale: int = 10**12,
    checkpoint: bool = False,
    redistribute_dangling: bool = False,
) -> DataFrame:
    """Integer-arithmetic PageRank — the iterative-propagation graph
    primitive next to connected_components (e.g. rank documents by
    citation/link structure when curating, or suppliers by part
    connectivity).

    ``edges`` is directed (src, dst); pass both directions for an
    undirected graph. All mass bookkeeping is integer (``scale`` units
    split across nodes; contributions use floor division on
    non-negative values, identical in every engine) so ranks are
    engine-exact and order-independent — a float PageRank's sums would
    be shuffle-order-dependent and unreproducible.

    Dangling-node mass: by default, nodes with no out-edges contribute
    NOTHING to the next round — their damped mass drains, so the total
    is NOT conserved across iterations (the standard simplification;
    relative ranking is what matters, and floor division already sheds
    remainder units anyway). Pass ``redistribute_dangling=True`` for
    the textbook treatment: each round, the summed mass held by
    dangling nodes is split uniformly across all nodes (an integer
    ``div n_nodes`` share added to every node's incoming sum before
    damping — only the sub-``n_nodes``-unit division remainder still
    drains). That variant costs one scalar aggregate per iteration (a
    bounded 1-row collect, same class as the node count).

    Per iteration: one join (contrib = p div out-degree onto edges) +
    one groupBy(dst) sum — both map-side-combinable, shuffle keyed on
    node id. No collect (only the node count, a scalar — plus the
    per-round dangling sum when redistributing). With
    ``checkpoint=True`` lineage is truncated per round
    (localCheckpoint) so deep iteration counts don't grow the plan —
    the same discipline connected_components uses.
    """
    # r16: edge-list barrier (the hits_scores/label_propagation
    # discipline) — degrees, the node roster (×2) and one join per
    # iteration all re-read ``edges``; checkpointing once stops each
    # reference replaying the caller's edge-building lineage
    if not edges.isStreaming:
        edges = edges.transform(_barrier)
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    # r16: the roster is referenced per iteration (the zero-fill join)
    # plus the init and the count below — materialize the narrow
    # column once; the count then reads the materialized blocks
    if not nodes.isStreaming:
        nodes = nodes.transform(_barrier)
    n_nodes = nodes.count()
    if n_nodes == 0:
        return nodes.withColumn("rank", F.lit(0).cast("bigint"))
    base = (100 - damping_pct) * scale // (100 * n_nodes)
    p = nodes.withColumn("p", F.lit(scale // n_nodes))
    prev_ckpt = None
    for _ in range(iters):
        share = 0
        if redistribute_dangling:
            dangling = (
                p.join(deg, p.node == deg.src, "left_anti")
                .agg(F.sum("p").alias("d"))
                .first()["d"]
            )
            share = int(dangling or 0) // n_nodes
        contrib = (
            p.join(deg, p.node == deg.src, "inner")
            .select(F.col("src"), F.expr("p div deg").alias("c"))
            .join(edges, "src")
            .groupBy("dst")
            .agg(F.sum("c").alias("s"))
        )
        p = (
            nodes.join(contrib, nodes.node == contrib.dst, "left")
            .select(
                "node",
                (
                    F.lit(base)
                    + F.expr(
                        f"({damping_pct} * (coalesce(s, 0) + {share})) div 100"
                    )
                ).alias("p"),
            )
        )
        if checkpoint:
            p = p.transform(_barrier)
            if prev_ckpt is not None:
                release_local_checkpoint(prev_ckpt)
            prev_ckpt = p
    return p.withColumnRenamed("p", "rank")


def dedup_clusters(
    docs: DataFrame,
    pairs: DataFrame,
    id_column: str = "doc_id",
    src: str = "id_a",
    dst: str = "id_b",
) -> DataFrame:
    """Label every document with its duplicate-cluster id and size.

    Output: (id_column, cluster_id, cluster_size, is_representative)
    where cluster_id = min doc id in the component (singletons map to
    themselves) and is_representative marks the one kept doc per
    cluster (the min id — deterministic, no tie-break ambiguity).
    """
    comp = connected_components(pairs, src, dst)
    labeled = (
        docs.select(F.col(id_column))
        .join(comp, docs[id_column] == comp["node"], "left")
        .select(
            F.col(id_column),
            F.coalesce("component", F.col(id_column)).alias("cluster_id"),
        )
    )
    sizes = labeled.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    return (
        labeled.join(sizes, "cluster_id")
        .select(
            id_column,
            "cluster_id",
            "cluster_size",
            (F.col(id_column) == F.col("cluster_id"))
            .cast("bigint")
            .alias("is_representative"),
        )
    )


def keep_best(
    docs: DataFrame,
    pairs: DataFrame,
    score,
    id_column: str = "doc_id",
    src: str = "id_a",
    dst: str = "id_b",
) -> DataFrame:
    """Canonical-survivor selection: after transitive closure of the
    duplicate pairs, keep the highest-``score`` document per cluster
    (ties break on the lower id — deterministic in any engine).

    This is the policy step a curation pipeline actually wants —
    ``dedup_clusters``' min-id representative discards quality
    information; here the survivor is the argmax of a caller-supplied
    score column expression evaluated over ``docs``.

    Output: one row per cluster —
    (cluster_id, kept_<id>, kept_score, cluster_size, n_dropped).

    Scale shape: clustering cost is the CC loop (see
    ``connected_components``); the argmax is one bounded rank window
    partitioned by cluster_id — no collect, no cross join.
    """
    from pyspark.sql import Window

    comp = connected_components(pairs, src, dst)
    labeled = (
        docs.select(F.col(id_column), score.alias("__score"))
        .join(comp, docs[id_column] == comp["node"], "left")
        .select(
            F.col(id_column),
            F.coalesce("component", F.col(id_column)).alias("cluster_id"),
            "__score",
        )
    )
    sizes = labeled.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    w = Window.partitionBy("cluster_id").orderBy(
        F.desc("__score"), F.asc(id_column)
    )
    return (
        labeled.withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") == 1)
        .join(sizes, "cluster_id")
        .select(
            "cluster_id",
            F.col(id_column).alias(f"kept_{id_column}"),
            F.col("__score").alias("kept_score"),
            "cluster_size",
            (F.col("cluster_size") - 1).alias("n_dropped"),
        )
    )


def leakage_safe_split(
    docs: DataFrame,
    pairs: DataFrame,
    id_column: str = "doc_id",
    splits=None,
    *,
    salt: str = "split",
) -> DataFrame:
    """Train/val/test assignment keyed on the duplicate-CLUSTER id, so
    near-duplicates can never straddle splits — the eval-leakage hole a
    per-document hash split leaves open (a test doc whose near-copy sits
    in train is a leaked answer; see the decontamination literature,
    e.g. Lee et al. 2022 §6).

    Composition of two proven parts: :func:`dedup_clusters` labels every
    doc with its component id, then ``sampling.hash_split`` hashes the
    CLUSTER id (not the doc id) into split buckets — every member of a
    cluster shares the hash key, hence the split. Singletons behave
    exactly like a plain per-doc split.

    Output: (id_column, cluster_id, cluster_size, split).
    """
    from sutro_spark.functions.sampling import hash_split

    labeled = dedup_clusters(docs, pairs, id_column)
    return hash_split(labeled, "cluster_id", splits, salt=salt).select(
        id_column, "cluster_id", "cluster_size", "split"
    )


def split_leakage_audit(
    pairs: DataFrame,
    assignments: DataFrame,
    *,
    id_a: str = "id_a",
    id_b: str = "id_b",
    id_column: str = "doc_id",
    split_column: str = "split",
) -> DataFrame:
    """The QA gate AFTER a split is chosen: count duplicate/near-dup
    pairs by (canonically ordered) split pair — a pair straddling two
    splits IS eval leakage (a test doc whose near-copy sits in train
    is a leaked answer; Lee et al. 2022 §6). :func:`leakage_safe_split`
    PREVENTS this by construction; this operator MEASURES it for any
    split produced elsewhere (a per-doc hash split, a time split, a
    split inherited from upstream) and for any pair generator (exact
    sha-group pairs, MinHash/SimHash/winnow candidates, embedding
    near-dups).

    Plan: two joins of the pairs table against the tiny (id, split)
    projection, one map-side-combinable groupBy — cost scales with
    |pairs|, never corpus². Pair ids missing from ``assignments``
    surface under the split name ``__unassigned__`` (the
    no-silent-caps rule), never dropped.

    Precondition (ENFORCED in-plan): ``assignments`` holds at most ONE
    row per id — a duplicated id would silently multiply its pairs'
    n_pairs through the joins, counter to the no-silent-caps rule, so
    the id projection aggregates per id and raise_errors on any
    duplicate (one extra map-side-combinable groupBy over the tiny
    assignments table; result unchanged when the precondition holds).

    Output: (split_a, split_b, n_pairs bigint, leaked boolean) with
    split_a <= split_b; ``leaked`` marks cross-split rows.
    """
    uniq = assignments.groupBy(F.col(id_column).alias("__id")).agg(
        F.count(F.lit(1)).alias("__n"),
        F.min(F.col(split_column)).alias("__s"),
    )
    guarded = F.when(
        F.col("__n") > 1,
        F.raise_error(
            F.concat(
                F.lit(
                    "split_leakage_audit: duplicate assignment rows for"
                    " id "
                ),
                F.col("__id").cast("string"),
                F.lit(" — one (id, split) row per id required"),
            )
        ),
    ).otherwise(F.col("__s"))
    a = uniq.select(
        F.col("__id").alias(id_a), guarded.alias("__sa")
    )
    b = uniq.select(
        F.col("__id").alias(id_b), guarded.alias("__sb")
    )
    j = (
        pairs.select(id_a, id_b)
        .join(a, id_a, "left")
        .join(b, id_b, "left")
    )
    sa = F.coalesce(F.col("__sa"), F.lit("__unassigned__"))
    sb = F.coalesce(F.col("__sb"), F.lit("__unassigned__"))
    return (
        j.groupBy(
            F.least(sa, sb).alias("split_a"),
            F.greatest(sa, sb).alias("split_b"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_pairs"))
        .withColumn("leaked", F.col("split_a") != F.col("split_b"))
    )


def propagate_cluster_labels(
    assignments: DataFrame,
    labels: DataFrame,
    *,
    id_column: str = "id",
    cluster_column: str = "cluster",
    label_column: str = "label",
) -> DataFrame:
    """Spread sparse labels across cluster members by majority vote —
    the cheap-supervision step after duplicate clustering: label ONE
    member of each near-dup cluster (human, LLM judge, or a rule) and
    every other member inherits it. Directly labeled rows always keep
    their own label (provenance 'direct'); unlabeled rows in a
    cluster with any labeled member get the cluster majority
    ('propagated', ties broken by smallest label string); members of
    fully-unlabeled clusters stay NULL ('none').

    Plan: one (cluster, label) count aggregate (map-side combinable,
    at most |labels| rows in the shuffle), a WindowGroupLimit argmax
    per cluster, then one broadcast-or-shuffle join back onto the
    assignment table. Cost scales with |assignments|, never pairs.

    Output: (id, cluster, label, provenance).
    """
    a = assignments.select(
        F.col(id_column).cast("long").alias("id"),
        F.col(cluster_column).cast("long").alias("cluster"),
    )
    l = labels.select(
        F.col(id_column).cast("long").alias("id"),
        F.col(label_column).cast("string").alias("__direct"),
    )
    votes = (
        a.join(l, "id")
        .groupBy("cluster", "__direct")
        .agg(F.count(F.lit(1)).alias("__n"))
    )
    w = Window.partitionBy("cluster").orderBy(
        F.desc("__n"), F.asc("__direct")
    )
    majority = (
        votes.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .select("cluster", F.col("__direct").alias("__majority"))
    )
    return (
        a.join(l, "id", "left")
        .join(majority, "cluster", "left")
        .select(
            "id",
            "cluster",
            F.coalesce(F.col("__direct"), F.col("__majority")).alias("label"),
            F.when(F.col("__direct").isNotNull(), F.lit("direct"))
            .when(F.col("__majority").isNotNull(), F.lit("propagated"))
            .otherwise(F.lit("none"))
            .alias("provenance"),
        )
    )


def triangle_count(
    edges: DataFrame,
    *,
    src_column: str = "src",
    dst_column: str = "dst",
) -> DataFrame:
    """Global triangle census of an undirected graph — the classic
    graph-health statistic behind clustering coefficients and
    community density. In a curation pipeline the triangle rate of a
    similarity graph (co-purchase, co-citation, near-dup) separates
    genuine cliques/communities (triangle-rich) from hub-and-spoke
    artifacts of a too-loose threshold (triangle-poor stars).

    Degree-ordered orientation (Latapy 2008 / "compact-forward"; same
    family as Suri & Vassilvitskii's MapReduce formulation, WWW 2011):
    after canonicalizing (self-loops dropped, both directions deduped
    to a<b), each edge is oriented from its lower-(degree, id)
    endpoint to the higher. Every triangle then has exactly ONE node
    with two out-edges, so counting (u->v, u->w, v->w with v before w
    in the same order) sees each triangle once — and the orientation
    bounds any node's out-degree by O(sqrt(m)), which is the whole
    trick: the wedge join is sized by sum(outdeg^2) <= m^1.5, never
    by a hub's full degree^2. At 100 TB the three joins shuffle on
    node/edge keys only; no adjacency list is ever materialized.

    Also emits the exact wedge (open-triad) count sum(d*(d-1)/2) and
    the global clustering coefficient 3*T/wedges as ONE IEEE division
    of exact BIGINTs (engine-reproducible, NULL when wedge-free).

    Output: one row (n_nodes, n_edges, n_wedges, n_triangles,
    clustering_coeff).
    """
    raw = edges.select(
        F.col(src_column).cast("long").alias("a"),
        F.col(dst_column).cast("long").alias("b"),
    ).where(F.col("a").isNotNull() & F.col("b").isNotNull())
    canon = (
        raw.where(F.col("a") != F.col("b"))
        .select(
            F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b")
        )
        .distinct()
    )
    # r16: canon is read 3× (degree build, orientation join, edge
    # count) and each reference otherwise replays the caller's
    # edge-building lineage (the co-purchase self-join + distinct) —
    # the same barrier the other graph operators carry
    if not canon.isStreaming:
        canon = canon.transform(_barrier)
    deg = (
        canon.select(F.col("a").alias("n"))
        .unionAll(canon.select(F.col("b").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).cast("long").alias("d"))
    )
    # orient low (deg, id) -> high (deg, id); rank = d * 2^40 + id is a
    # single BIGINT key embedding the lexicographic order (ids and
    # degrees both < 2^40 — beyond that switch to a struct comparison)
    ranked = deg.select(
        "n", (F.col("d") * F.lit(1 << 40) + F.col("n")).alias("r")
    )
    da = ranked.select(F.col("n").alias("a"), F.col("r").alias("ra"))
    db = ranked.select(F.col("n").alias("b"), F.col("r").alias("rb"))
    oriented = (
        canon.join(da, "a")
        .join(db, "b")
        .select(
            F.when(F.col("ra") < F.col("rb"), F.col("a"))
            .otherwise(F.col("b"))
            .alias("u"),
            F.when(F.col("ra") < F.col("rb"), F.col("b"))
            .otherwise(F.col("a"))
            .alias("v"),
            F.greatest("ra", "rb").alias("rv"),
        )
    )
    # r16: oriented feeds three legs (both wedge sides + the closing
    # edge probe); materialize the narrow (u, v, rv) table once instead
    # of re-running the canon⋈rank joins per leg
    if not oriented.isStreaming:
        oriented = oriented.transform(_barrier)
    e1 = oriented.select("u", F.col("v").alias("x"), F.col("rv").alias("rx"))
    e2 = oriented.select("u", F.col("v").alias("y"), F.col("rv").alias("ry"))
    wedges = e1.join(e2, "u").where(F.col("rx") < F.col("ry"))
    closing = oriented.select(
        F.col("u").alias("x"), F.col("v").alias("y")
    )
    tri = wedges.join(closing, ["x", "y"]).agg(
        F.count(F.lit(1)).cast("long").alias("n_triangles")
    )
    stats = canon.agg(
        F.count(F.lit(1)).cast("long").alias("n_edges")
    ).crossJoin(
        deg.agg(
            F.count(F.lit(1)).cast("long").alias("n_nodes"),
            F.coalesce(F.sum(F.expr("d * (d - 1) div 2")), F.lit(0))
            .cast("long")
            .alias("n_wedges"),
        )
    )
    return stats.crossJoin(tri).select(
        "n_nodes",
        "n_edges",
        "n_wedges",
        "n_triangles",
        F.expr(
            "CASE WHEN n_wedges > 0 THEN"
            " CAST(3 * n_triangles AS DOUBLE) / CAST(n_wedges AS DOUBLE)"
            " END"
        ).alias("clustering_coeff"),
    )


def hits_scores(
    edges: DataFrame,
    *,
    src_column: str = "src",
    dst_column: str = "dst",
    rounds: int = 2,
    scale: int = 1000,
    checkpoint: bool = False,
) -> DataFrame:
    """HITS hubs & authorities (Kleinberg, JACM 1999) — the mutual-
    reinforcement ranking next to :func:`pagerank`: a node is a good
    AUTHORITY when good hubs point at it and a good HUB when it points
    at good authorities (citation graphs, link curation, co-purchase
    "catalog part vs connector part" separation).

    PURE BIGINT power iteration: scores live in ``scale``-ths, and
    each round normalizes by the MAXIMUM raw score instead of the L2
    norm —

        x' = (2*scale*x_raw + mx) div (2*mx)     (half-up, x_raw >= 0)

    Max-normalization preserves the ranking and the converged
    direction of power iteration while keeping every intermediate an
    exact integer: no sqrt, no float sum, nothing order-dependent —
    the DuckDB oracle unrolls identical rounds (a stricter discipline
    than :func:`~sutro_spark.operators.similarity.pca_top_direction`,
    whose signed values force an L2/sqrt round-trip). Overflow:
    2*scale*x_raw <= 2*scale^2*max_indegree — safe past 10^12-edge
    hubs.

    Per round: a <- A^T h then h <- A a — two joins + two
    map-side-combinable groupBys, each shuffled on the node key; the
    1-row max attaches by broadcast cross join (no collect).
    ``checkpoint=True`` truncates lineage per round (the pagerank
    discipline) for deep iteration counts.

    Pass both directions for an undirected graph. Duplicate edges
    WEIGHT the sums (dedupe upstream if unwanted). Nodes with no
    in-edges score authority 0; no out-edges, hub 0.

    Output: (node, hub_milli bigint, authority_milli bigint).
    """
    if rounds < 1:
        raise ValueError(f"rounds must be >= 1, got {rounds}")
    e = edges.select(
        F.col(src_column).alias("s"), F.col(dst_column).alias("d")
    )
    # r16: the edge list is re-read ~3+2·rounds times by this loop
    # (node roster ×2, one join per half-round, the final outer joins);
    # without a materialization barrier each reference replays the
    # caller's whole edge-building lineage (e.g. the co-purchase
    # self-join + distinct). One narrow (s, d) materialization at any
    # scale. Measured 5.7 s → 3.4 s for the hits [Q] at sf0.1.
    if not e.isStreaming:
        e = e.transform(_barrier)
    nodes = (
        e.select(F.col("s").alias("node"))
        .union(e.select(F.col("d").alias("node")))
        .distinct()
    )
    # r16: the roster is referenced ~2·rounds+2 times (each
    # _normalize's zero-fill join, the init, the final outer joins) —
    # materialize the single narrow column once instead of re-running
    # the distinct-union per reference
    if not nodes.isStreaming:
        nodes = nodes.transform(_barrier)
    h = nodes.withColumn("h", F.lit(scale).cast("long"))
    a = None
    prev = []

    def _normalize(raw: DataFrame, col: str) -> DataFrame:
        filled = nodes.join(raw, "node", "left").select(
            "node", F.coalesce(F.col(col), F.lit(0)).cast("long").alias(col)
        )
        mx = filled.agg(F.max(col).alias("__mx"))
        return filled.crossJoin(F.broadcast(mx)).select(
            "node",
            F.expr(
                f"CASE WHEN __mx > 0 THEN"
                f" (2 * {scale} * {col} + __mx) div (2 * __mx)"
                f" ELSE CAST(0 AS BIGINT) END"
            ).alias(col),
        )

    for _ in range(rounds):
        a_raw = (
            e.join(h.withColumnRenamed("node", "s"), "s")
            .groupBy(F.col("d").alias("node"))
            .agg(F.sum("h").alias("a"))
        )
        a = _normalize(a_raw, "a")
        h_raw = (
            e.join(a.withColumnRenamed("node", "d"), "d")
            .groupBy(F.col("s").alias("node"))
            .agg(F.sum("a").alias("h"))
        )
        h = _normalize(h_raw, "h")
        if checkpoint:
            a = a.transform(_barrier)
            h = h.transform(_barrier)
            for f in prev:
                release_local_checkpoint(f)
            prev = [a, h]
    return (
        nodes.join(h, "node", "left")
        .join(a, "node", "left")
        .select(
            "node",
            F.coalesce("h", F.lit(0)).cast("long").alias("hub_milli"),
            F.coalesce("a", F.lit(0)).cast("long").alias("authority_milli"),
        )
    )


def label_propagation(
    edges: DataFrame,
    *,
    src_column: str = "src",
    dst_column: str = "dst",
    rounds: int = 3,
    checkpoint: bool = False,
) -> DataFrame:
    """Community detection by synchronous label propagation (Raghavan
    et al. 2007) — the community complement of
    :func:`connected_components` (components = reachability;
    communities = edge DENSITY: a bridge keeps two dense clusters one
    component but LPA separates them).

    Deterministic variant: labels start as node ids; each round every
    node adopts the most frequent label among its neighbors, ties
    broken by SMALLEST label — the argmax is ``max(struct(cnt,
    -label))``, an associative map-side-combinable aggregate (no rank
    window over hot nodes), and every value is an exact BIGINT, so
    any engine replays the rounds identically (classic async LPA is
    visit-order-dependent and unreproducible by construction —
    useless under an oracle). Synchronous LPA can oscillate on
    bipartite-ish structure; ``rounds`` is a bounded budget and the
    output is the honest state after exactly ``rounds`` updates.

    Pass both directions for an undirected graph. Isolated sides
    never occur (nodes come from the edge list); a node keeps its
    current label when it has no in-neighbors under the given
    direction.

    Per round: one join (labels onto edges) + one (node, label) count
    + one per-node argmax — all combinable, shuffled on node keys.
    ``checkpoint=True`` truncates lineage per round.

    Output: (node, community bigint).
    """
    if rounds < 1:
        raise ValueError(f"rounds must be >= 1, got {rounds}")
    e = edges.select(
        F.col(src_column).cast("long").alias("s"),
        F.col(dst_column).cast("long").alias("d"),
    )
    # r16: same edge-list barrier as hits_scores — one join per round
    # plus the node roster otherwise replay the caller's edge-building
    # lineage per reference
    if not e.isStreaming:
        e = e.transform(_barrier)
    nodes = (
        e.select(F.col("s").alias("node"))
        .union(e.select(F.col("d").alias("node")))
        .distinct()
    )
    lab = nodes.withColumn("community", F.col("node"))
    prev = None
    for _ in range(rounds):
        votes = (
            e.join(
                lab.select(F.col("node").alias("s"), F.col("community")),
                "s",
            )
            .groupBy(F.col("d").alias("node"), "community")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        best = votes.groupBy("node").agg(
            F.max(F.struct(F.col("cnt"), (-F.col("community")).alias("nl"))).alias(
                "__b"
            )
        ).select("node", (-F.col("__b.nl")).alias("__new"))
        # r16: lab ALWAYS carries exactly the node roster (it starts as
        # `nodes` and every update left-joins onto it), so the former
        # `nodes.join(lab, "node")` was an inner join between identical
        # key sets — row-identical to lab, but it re-derived the roster
        # (a distinct-union over the edge list) every round
        lab = lab.join(best, "node", "left").select(
            "node",
            F.coalesce(F.col("__new"), F.col("community")).alias("community"),
        )
        if checkpoint:
            lab = lab.transform(_barrier)
            if prev is not None:
                release_local_checkpoint(prev)
            prev = lab
    return lab


def kcore(
    edges: DataFrame,
    *,
    k: int = 3,
    rounds: int = 4,
    src_column: str = "src",
    dst_column: str = "dst",
    checkpoint: bool = True,
) -> DataFrame:
    """Bounded k-core peel: repeatedly delete nodes of degree < k
    (with their edges) from an undirected graph, ``rounds`` times.
    The k-core — the maximal subgraph where everyone keeps >= k
    neighbors — is the standard "dense part" extractor: in a near-dup
    or co-occurrence graph it separates genuine communities from the
    long tail of incidental pairs that triangle counts flag in
    aggregate and this op extracts in the particular.

    BOUNDED, deterministic semantics (the `pagerank` convention):
    exactly ``rounds`` peels — except that peeling is idempotent once
    converged, so the loop exits early IFF a round deletes nothing
    (the result is then identical to running all rounds, and an
    unrolled fixed-round oracle still matches). ``converged`` on
    every row reports whether the LAST executed round was a no-op;
    false means the peel was still shrinking when the budget ran out
    — rerun with more rounds, the answer is an honest upper bound on
    the true core, not the core itself.

    Per round: one degree groupBy + two semi-joins — all keyed on
    node id, map-side combinable, no collect except the bounded
    1-row change count. localCheckpoint truncates lineage per round
    and the superseded round's blocks are released (the repo's
    iterative-loop discipline).

    Output: (node, degree, converged) — the surviving subgraph's
    nodes with their within-subgraph degree.
    """
    if k < 1 or rounds < 1:
        raise ValueError("k and rounds must be >= 1")
    raw = edges.select(
        F.col(src_column).cast("long").alias("a"),
        F.col(dst_column).cast("long").alias("b"),
    ).where(F.col("a").isNotNull() & F.col("b").isNotNull())
    cur = (
        raw.where(F.col("a") != F.col("b"))
        .select(
            F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b")
        )
        .distinct()
    )
    if checkpoint:
        cur = cur.transform(_barrier)
    prev_ckpt = cur if checkpoint else None
    converged = False
    # r16: count cur ONCE before the loop and carry each round's
    # count forward — `before` was recomputed per round even though it
    # equals the previous round's `after` (one bounded-scalar job per
    # round saved; identical convergence decisions)
    before = cur.count()
    for _ in range(rounds):
        deg = (
            cur.select(F.col("a").alias("n"))
            .unionAll(cur.select(F.col("b").alias("n")))
            .groupBy("n")
            .agg(F.count(F.lit(1)).cast("long").alias("d"))
        )
        keep = deg.where(F.col("d") >= k).select("n")
        nxt = cur.join(
            keep.withColumnRenamed("n", "a"), "a", "left_semi"
        ).join(keep.withColumnRenamed("n", "b"), "b", "left_semi")
        if checkpoint:
            # r17: the bounded change-count rides the checkpoint's own
            # materialization job via observe() (the CC-loop pattern)
            # — one driver-synchronized job per peel round, not two
            obs = Observation()
            nxt = nxt.observe(obs, F.count(F.lit(1)).alias("n")).transform(
                _barrier
            )
            after = obs.get["n"]
        else:
            # bounded scalar: did this round delete anything?
            after = nxt.count()
        if checkpoint and prev_ckpt is not None and nxt is not prev_ckpt:
            release_local_checkpoint(prev_ckpt)
        cur, prev_ckpt = nxt, (nxt if checkpoint else None)
        if after == before:
            converged = True
            break
        before = after
    deg = (
        cur.select(F.col("a").alias("n"))
        .unionAll(cur.select(F.col("b").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).cast("long").alias("d"))
    )
    return deg.select(
        F.col("n").alias("node"),
        F.col("d").alias("degree"),
        F.lit(converged).alias("converged"),
    )


def incremental_components(
    labels: DataFrame,
    new_edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    *,
    node_column: str = "node",
    component_column: str = "component",
    max_iter: int = 50,
) -> DataFrame:
    """Maintain connected components as new edges arrive WITHOUT
    re-reading the accumulated pair set: a prior run's (node,
    component) label table is itself a star graph with identical
    connectivity (every node connected to its component root), so
    unioning it with the new batch's edges and re-running CC yields
    exactly the components of (all old pairs + new pairs) — the
    incremental-dedup cluster step that pairs with
    `incremental_jaccard_pairs`.

    Why this is the 100 TB shape: the accumulated candidate-pair set
    grows without bound (every batch appends), but the label table is
    ONE ROW PER CLUSTERED NODE — re-clustering from labels reads
    O(nodes) + O(new batch) instead of O(all pairs ever). And because
    the label part is already star-shaped, large-star/small-star
    converges in ~2 rounds regardless of how many batches built it.

    Component ids stay canonical (min node id), so they are STABLE
    under growth except when a new edge genuinely merges two old
    components — the merged cluster takes the smaller root, exactly
    as a from-scratch run would.

    Output: (node, component) — same contract as
    :func:`connected_components` (nodes with at least one neighbor).
    """
    star = labels.select(
        F.col(node_column).alias("id_a"),
        F.col(component_column).alias("id_b"),
    ).where(F.col(node_column) != F.col(component_column))
    fresh = new_edges.select(
        F.col(src).alias("id_a"), F.col(dst).alias("id_b")
    )
    return connected_components(
        star.unionByName(fresh), "id_a", "id_b", max_iter=max_iter
    )
