"""Connected components for duplicate-cluster resolution.

LSH/SimHash near-dup detection emits *pairs*; a training-data pipeline needs
*clusters* (keep one survivor per group of transitively-linked documents).
That is connected components over the pair graph, with the canonical cluster
id = the minimum member id.

Scale notes: this is min-label propagation — each round is one shuffle
(join on the edge key + groupBy min), and it converges in graph-diameter
rounds. Near-dup graphs are shallow (dupes link to an original, diameters
of a few), so the round count is small and data-independent-ish. For
adversarial deep graphs at 100 TB use
:func:`connected_components_star` — the large-star/small-star alternation
(Kiveris et al. 2014, "Connected Components in MapReduce and Beyond"),
which contracts chains in O(log² n) rounds over the same join+groupBy
primitives (tested equivalent, incl. a 60-node path in ≤12 rounds). Each round ``localCheckpoint``s to truncate lineage — without it
the plan doubles per iteration and the driver, not the data, becomes the
bottleneck.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame, src: str, dst: str, max_iter: int = 50
) -> DataFrame:
    """Return (id, label) with ``label`` = min node id of each component.

    ``edges`` are undirected pairs; isolated nodes don't appear (every id in
    ``edges`` does, on either side). Raises if not converged in ``max_iter``
    rounds — near-dup graphs converge in a handful.
    """
    und = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        # materialize once: the edge list is re-joined every round, and the
        # upstream plan (LSH candidate join + Jaccard verify for near-dup
        # input) would otherwise re-run per iteration
        .localCheckpoint(eager=True)
    )
    labels = und.select(F.col("a").alias("id")).distinct().withColumn(
        "label", F.col("id")
    )
    for _ in range(max_iter):
        nbr = und.join(labels, und["b"] == labels["id"]).select(
            und["a"].alias("id"), F.col("label")
        )
        new_labels = (
            labels.union(nbr).groupBy("id").agg(F.min("label").alias("label"))
        ).localCheckpoint(eager=True)
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.label") < F.col("o.label"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            return labels
    raise RuntimeError(f"connected_components did not converge in {max_iter} rounds")


def connected_components_star(
    edges: DataFrame, src: str, dst: str, max_iter: int = 30
) -> DataFrame:
    """Two-phase large-star/small-star connected components (Kiveris et al.
    2014, "Connected Components in MapReduce and Beyond" — the alternating
    formulation). Same (id, label) contract as :func:`connected_components`.

    Why it exists: min-label propagation converges in DIAMETER rounds —
    fine for shallow near-dup graphs, catastrophic for an adversarial
    path/chain graph at 100 TB (a 10^6-long chain = 10^6 shuffles). The
    star operations contract chains in O(log² n) rounds (O(log n) in
    practice) using the same join+groupBy primitives:

    - large-star: for every node u, connect each strictly-LARGER neighbor
      v to u's minimum neighbor-or-self m(u);
    - small-star: connect each neighbor v ≤ u (and u) to m(u).

    Both keep the invariant that the edge set's connectivity is unchanged
    while monotonically lowering every node's reachable minimum; the fixed
    point is a star centered at each component's min id. Every round
    ``localCheckpoint``s to truncate lineage, like the propagation loop.
    """
    def _large_star(e: DataFrame) -> DataFrame:
        # operates on the SYMMETRIZED neighborhood: for each u with
        # m = min(Γ(u) ∪ {u}), emit (v, m) for every neighbor v > u.
        sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        m = (
            sym.union(sym.select("u", F.col("u").alias("v")))
            .groupBy("u")
            .agg(F.min("v").alias("m"))
        )
        return (
            sym.join(m, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )

    def _small_star(e: DataFrame) -> DataFrame:
        # input is big→small oriented (large-star emits v > m); for each u
        # with m = min(Γ(u) ∪ {u}) over its SMALLER neighbors, emit (v, m)
        # for every neighbor and (u, m).
        m = (
            e.union(e.select("u", F.col("u").alias("v")))
            .groupBy("u")
            .agg(F.min("v").alias("m"))
        )
        withm = e.join(m, "u")
        return (
            withm.select(F.col("v").alias("u"), F.col("m").alias("v"))
            .union(m.select("u", F.col("m").alias("v")))
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )

    e = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        e2 = _small_star(_large_star(e)).localCheckpoint(eager=True)
        stable = (
            e2.exceptAll(e).limit(1).count() == 0
            and e.exceptAll(e2).limit(1).count() == 0
        )
        e = e2
        if stable:
            break
    else:
        raise RuntimeError(f"star CC did not converge in {max_iter} rounds")
    # fixed point: stars — every edge points at its component's min; the
    # centers label themselves
    labels = e.select(F.col("u").alias("id"), F.col("v").alias("label"))
    centers = e.select(F.col("v").alias("id")).distinct().withColumn("label", F.col("id"))
    return labels.union(centers).groupBy("id").agg(F.min("label").alias("label"))


def pagerank_int(
    edges: DataFrame,
    iterations: int = 3,
    total_mass: int = 10**12,
    damping_pct: int = 85,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Fixed-iteration PageRank in pure integer arithmetic.

    Float PageRank sums contributions in shuffle-combine order, which is
    nondeterministic — this variant keeps every rank an integer number of
    mass units (``total_mass`` split across nodes), so each step is
    bit-exact under any partitioning AND replayable by an unrolled SQL
    oracle: contributions use truncating integer division ``r div deg``,
    damping is ``(pct·s) div 100``. The truncation loss is ≤ deg units
    per node per round — at 1e12 units, noise in the 12th decimal.

    Plan shape per iteration: one join of the rank table onto the edge
    list hashed on ``src`` (rank and degree tables are node-sized — tiny
    next to the edge table, broadcastable when they fit), one
    ``groupBy(dst).sum`` — the edge table itself is never re-keyed
    between iterations, so at scale it can be pre-partitioned on ``src``
    once and every iteration reuses that layout. Fixed ``iterations``
    (the public convergence-free formulation; power iteration converges
    geometrically, 3-5 rounds rank-order-stabilizes real graphs).

    Returns ``(node, rank)`` with integer ``rank`` summing to ≈
    ``total_mass``. Dangling nodes keep only the base (teleport) mass.
    """
    # edge list + per-source degree computed ONCE and persisted: building
    # degrees/nodes and every iteration would otherwise re-evaluate the
    # caller's (often expensive) edge derivation 4+ times. The explicit
    # repartition on src keys the persisted layout so the degree groupBy
    # reuses it with no further exchange (and caps the partition count a
    # union-of-unions input would otherwise inflate).
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .repartition(F.col("src"))
        .persist()
    )
    ed = e.join(
        e.groupBy("src").agg(F.count(F.lit(1)).alias("deg")), on="src"
    ).persist()
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    n = nodes.count()
    base = (total_mass * (100 - damping_pct)) // (100 * n)
    ranks = nodes.withColumn("rank", F.lit(total_mass // n).cast("long"))
    for _ in range(iterations):
        # ranks is node-sized — broadcast it so the (persisted, src-keyed)
        # edge table never re-enters an exchange: per iteration the only
        # shuffle left is the map-side-combined groupBy(dst). At node
        # counts past broadcast reach, drop the hint and pre-partition
        # both sides on src once instead.
        contribs = (
            ed.join(F.broadcast(ranks), ed["src"] == ranks["node"])
            .select(F.col("dst").alias("node"), F.expr("rank div deg").alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("s"))
        )
        ranks = nodes.join(F.broadcast(contribs), on="node", how="left").select(
            "node",
            (
                F.lit(base)
                + F.expr(f"({damping_pct} * coalesce(s, 0L)) div 100")
            ).alias("rank"),
        )
    # materialize the node-count-sized result, then release the cached
    # edge tables — otherwise every call pins the full edge list in
    # storage for the session's lifetime
    ranks = ranks.localCheckpoint(eager=True)
    for cached in (ed, nodes):
        cached.unpersist()
    e.unpersist()
    return ranks


def triangle_count(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Exact triangle count via degree-ordered edge orientation (Suri &
    Vassilvitskii 2011, "Counting Triangles and the Curse of the Last
    Reducer"). Every undirected edge is directed from its lower-ranked
    endpoint (rank = (degree, id) — total order), wedges are generated
    only at each edge's LOWER-degree endpoint, and a wedge (v, w) closes
    iff the oriented edge v→w exists.

    Why this is the 100 TB shape: naive wedge generation at every node
    creates C(deg, 2) pairs at the hubs — a celebrity node with 10M
    neighbors yields 5·10¹³ wedges on one reducer. Orientation bounds
    every node's out-degree by O(√m), so wedge work is O(m^{3/2}) total
    and balanced. Three shuffles: degree agg, the wedge self-join on the
    source, and the closing-edge join.

    Returns one row: (n_nodes, n_edges, n_wedges, n_triangles,
    clustering) where clustering = 3·triangles / Σ C(deg,2) rounded to 6
    decimals (the global clustering coefficient; int/int division)."""
    # normalize: undirected distinct edges as (a, b), no self-loops
    a, b = F.least(F.col(src), F.col(dst)), F.greatest(F.col(src), F.col(dst))
    e = edges.select(a.alias("a"), b.alias("b")).where(F.col("a") != F.col("b")).distinct()
    deg = (
        e.select(F.col("a").alias("node"))
        .union(e.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    from pyspark.sql import Window

    rank = deg.select(
        "node",
        "deg",
        F.row_number().over(Window.orderBy("deg", "node")).alias("rk"),
    )
    # the rank window is over the NODE table (not edges); at extreme node
    # counts swap row_number for zipWithIndex-style dense ids — the edge
    # joins below are the load-bearing part
    er = (
        e.join(F.broadcast(rank.select(F.col("node").alias("a"), F.col("rk").alias("ra"))), on="a")
        .join(F.broadcast(rank.select(F.col("node").alias("b"), F.col("rk").alias("rb"))), on="b")
        .select(
            F.when(F.col("ra") < F.col("rb"), F.col("a")).otherwise(F.col("b")).alias("u"),
            F.when(F.col("ra") < F.col("rb"), F.col("rb")).otherwise(F.col("ra")).alias("rv"),
            F.when(F.col("ra") < F.col("rb"), F.col("b")).otherwise(F.col("a")).alias("v"),
        )
    )
    w1 = er.select(F.col("u"), F.col("v").alias("x"), F.col("rv").alias("rx"))
    w2 = er.select(F.col("u"), F.col("v").alias("y"), F.col("rv").alias("ry"))
    wedges = w1.join(w2, on="u").where(F.col("rx") < F.col("ry")).select("x", "y")
    closing = er.select(F.col("u").alias("x"), F.col("v").alias("y"))
    # wedge count and triangle count in ONE pass over the wedge join —
    # the earlier wedges.count() + semi-join count() pair ran the
    # O(m^{3/2}) wedge-generation stage TWICE (the persist below covers
    # e/er, not the wedge join above them). closing's (x, y) pairs are
    # distinct edges, so the left join matches each wedge at most once
    # and count(match) ≡ the semi-join count, exactly.
    closed = wedges.join(
        closing.withColumn("__closed", F.lit(1)), on=["x", "y"], how="left"
    )
    # the actions below share the e/er lineage — persist both for the duration
    e = e.persist()
    er = er.persist()
    # node count and wedge-capacity sum fused into one aggregate as well:
    # four actions total (deg agg, e count, wedge+triangle agg, and the
    # persist materializations they trigger) instead of five
    drow = deg.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("deg") * (F.col("deg") - 1) / 2).cast("long").alias("t"),
    ).collect()[0]
    n_nodes, n_triples = drow["n"], drow["t"]
    n_edges = e.count()
    wrow = closed.agg(
        F.count(F.lit(1)).alias("w"), F.count("__closed").alias("tri")
    ).collect()[0]
    n_wedges, n_tri = wrow["w"], wrow["tri"]
    e.unpersist()
    er.unpersist()
    spark = edges.sparkSession
    return spark.createDataFrame(
        [
            (
                n_nodes,
                n_edges,
                n_wedges,
                n_tri,
                round(3.0 * n_tri / n_triples, 6) if n_triples else 0.0,
            )
        ],
        "n_nodes long, n_edges long, n_wedges long, n_triangles long, clustering double",
    )


def bfs_hops(
    edges: DataFrame,
    source: int,
    max_hops: int = 6,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Undirected BFS hop distances from ``source``: returns ``(node,
    hops)`` for every node within ``max_hops`` (the source itself at 0).

    Iterative frontier expansion — the MapReduce-classic plan: each round
    joins the (shrinking) frontier to the edge list, anti-joins away
    already-visited nodes, and ``localCheckpoint``s to truncate lineage
    (same discipline as :func:`connected_components`; without it the plan
    doubles per round). Rounds are data-independent: exactly
    ``min(eccentricity, max_hops)``. Each round shuffles only (node)
    frontier keys against the edge partitioning — the edge list is the
    big side and is never re-materialized.

    Hop distances are unique minima, so the result is deterministic under
    any partitioning; the SQL oracle replays it as a recursive CTE with
    UNION-dedup and ``min(hops)``.
    """
    sess = edges.sparkSession
    # materialize the (narrow) edge list once: every round joins against
    # it, and without this the upstream edge derivation (often a join
    # itself) would re-execute per round
    und = (
        edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
        .unionByName(edges.select(F.col(dst).alias("s"), F.col(src).alias("d")))
        .localCheckpoint()
    )
    known = sess.createDataFrame([(source, 0)], "node long, hops int").localCheckpoint()
    frontier = known
    for hop in range(1, max_hops + 1):
        nxt = (
            frontier.join(und, frontier["node"] == und["s"])
            .select(F.col("d").alias("node"))
            .distinct()
            .join(known.select("node"), on="node", how="left_anti")
            .withColumn("hops", F.lit(hop))
            .localCheckpoint()
        )
        if nxt.limit(1).count() == 0:
            break
        known = known.unionByName(nxt).localCheckpoint()
        frontier = nxt
    return known
