"""Near-duplicate clustering: connected components over a candidate-pair
edge list (the step that turns pairwise LSH/Jaccard matches into dedup
GROUPS, so one representative per component survives).

Algorithm: min-label propagation — every vertex repeatedly takes the
minimum component label among itself and its neighbors until no label
changes.  Each iteration is one hash join (edges ⨝ labels) + one groupBy
min + one full-outer-free left join; convergence needs O(graph diameter)
iterations, and near-dup components are short-diameter by construction
(members of a cluster share bands/shingles with a common core).  For
adversarial long-chain graphs, connected_components_star implements the
alternating large-star/small-star scheme (Kiveris et al., "Connected
Components in MapReduce and Beyond"): O(log n) rounds with the same
per-round join shape — same output contract, drop-in swap.

Scale: labels and edges shuffle on vertex id each round; the driver sees
ONE small count job per round (changed-label count).  Edges are cached
once (reused every iteration); label frames are swapped and unpersisted
round to round.

Oracle: exact — DuckDB recomputes components with a recursive CTE
(reachability + min), see queries_training's near-dup cluster query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(edges: DataFrame, vertices: DataFrame | None = None,
                         max_iter: int = 25) -> DataFrame:
    """(id, component) — component = min vertex id reachable from id.

    edges: (id1, id2) undirected pairs; vertices: optional (id) frame of
    ALL vertices (isolated ones become their own singleton component).
    """
    everts = (edges.select(F.col("id1").alias("id"))
              .unionByName(edges.select(F.col("id2").alias("id"))))
    verts = everts if vertices is None else everts.unionByName(
        vertices.select(F.col(vertices.columns[0]).alias("id")))
    verts = verts.distinct()
    # symmetric neighbor list, cached once — reused by every round
    sym = (edges.select(F.col("id1").alias("id"), F.col("id2").alias("nbr"))
           .unionByName(
               edges.select(F.col("id2").alias("id"), F.col("id1").alias("nbr")))
           .cache())
    # each round references the previous labels TWICE (neighbor join +
    # self join), so a cache alone leaves an exponentially-growing logical
    # plan that OOMs the driver after ~10 rounds — localCheckpoint
    # truncates the lineage every round (the standard iterative-algorithm
    # pattern; on a real cluster swap in reliable checkpoint() if executor
    # loss during the loop must be survivable)
    labels = verts.select("id", F.col("id").alias("comp")).localCheckpoint()
    changed = None
    for _ in range(max_iter):
        nbr_min = (sym.join(labels.select(F.col("id").alias("nbr"),
                                          F.col("comp").alias("nbr_comp")), "nbr")
                   .groupBy("id").agg(F.min("nbr_comp").alias("nbr_comp")))
        # carry the OLD label through the checkpointed frame so the
        # changed-count is a map-only filter over the checkpoint blocks —
        # the r1-r7 form re-joined new labels against old labels, paying
        # a full extra shuffle join per round just for the convergence
        # counter (r8, guide §2.4: remove shuffles outright)
        new_labels = (labels.join(nbr_min, "id", "left")
                      .select("id", F.least(F.col("comp"),
                                            F.coalesce(F.col("nbr_comp"),
                                                       F.col("comp"))).alias("comp"),
                              F.col("comp").alias("_old"))
                      .localCheckpoint())
        changed = new_labels.filter(F.col("comp") != F.col("_old")).count()
        labels = new_labels.select("id", "comp")
        if changed == 0:
            break
    sym.unpersist()
    if changed:
        # returning partially-propagated labels would silently split true
        # components (duplicates surviving dedup) — fail LOUDLY instead;
        # a graph with diameter > max_iter needs a bigger max_iter or the
        # large-star/small-star O(log n) scheme (module docstring)
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds "
            f"({changed} labels still changing); raise max_iter or switch "
            "to large-star/small-star for long-chain graphs")
    return labels.select("id", F.col("comp").alias("component"))


def connected_components_star(edges: DataFrame,
                              vertices: DataFrame | None = None,
                              max_iter: int = 50) -> DataFrame:
    """(id, component) via alternating large-star/small-star (Kiveris et
    al., "Connected Components in MapReduce and Beyond") — O(log n) rounds
    on ANY graph shape, including the adversarial long chains where
    min-label propagation needs O(diameter) rounds.  Same output contract
    as connected_components: component = min vertex id reachable.

    Per round: large-star hangs every strictly-larger neighbor of u under
    min(Γ(u) ∪ u); small-star re-hangs every downhill neighbor under the
    group minimum.  Both are one groupBy + one join on vertex id.
    Convergence = the edge set stops changing: a cheap (count, order-free
    hash signature) pre-check per round, then a structural exceptAll
    equality confirm at the match (signature collisions cannot terminate
    the loop early on a non-star state)."""
    everts = (edges.select(F.col("id1").alias("id"))
              .unionByName(edges.select(F.col("id2").alias("id"))))
    verts = everts if vertices is None else everts.unionByName(
        vertices.select(F.col(vertices.columns[0]).alias("id")))
    verts = verts.distinct()

    e = (edges.select(F.col("id1").alias("src"), F.col("id2").alias("dst"))
         .filter(F.col("src") != F.col("dst")).distinct().localCheckpoint())

    def _signature(df):
        # mod keeps the order-free sum inside int64 under ANSI overflow checks
        row = df.agg(F.count(F.lit(1)).alias("n"),
                     F.sum(F.pmod(F.xxhash64("src", "dst"),
                                  F.lit(1_000_000_007))).alias("h")).first()
        return (row["n"], row["h"])

    def _large_star(df):
        sym = (df.unionByName(df.select(F.col("dst").alias("src"),
                                        F.col("src").alias("dst"))))
        mins = (sym.groupBy("src")
                .agg(F.least(F.min("dst"), F.first("src")).alias("m")))
        return (sym.filter(F.col("dst") > F.col("src"))
                .join(mins, "src")
                .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
                .filter(F.col("src") != F.col("dst")).distinct())

    def _small_star(df):
        o = (df.select(F.greatest("src", "dst").alias("src"),
                       F.least("src", "dst").alias("dst")).distinct())
        mins = o.groupBy("src").agg(F.min("dst").alias("m"))
        hang = (o.join(mins, "src")
                .select(F.col("dst").alias("src"), F.col("m").alias("dst")))
        self_edges = mins.select("src", F.col("m").alias("dst"))
        return (hang.unionByName(self_edges)
                .filter(F.col("src") != F.col("dst")).distinct())

    sig = _signature(e)
    for _ in range(max_iter):
        prev = e
        e = _small_star(_large_star(e)).localCheckpoint()
        new_sig = _signature(e)
        if new_sig == sig:
            # signature match is a fast pre-check only: a (count, hash-sum)
            # collision between two DISTINCT successive edge sets would
            # otherwise terminate on a non-star state (wrong/duplicated
            # components).  Confirm the fixpoint structurally ONCE — both
            # sides are distinct sets, so two anti-joins prove equality.
            if (e.exceptAll(prev).isEmpty()
                    and prev.exceptAll(e).isEmpty()):
                break
        sig = new_sig
    else:
        raise RuntimeError(
            f"connected_components_star did not converge in {max_iter} "
            "rounds — not expected for any graph (O(log n) bound); check "
            "for non-deterministic edge input")
    # converged: e is a star (child -> root, root = component min)
    return (verts.join(e.select(F.col("src").alias("id"),
                                F.col("dst").alias("component")), "id", "left")
            .select("id", F.coalesce(F.col("component"), F.col("id"))
                    .alias("component")))


def dedup_survivors(docs: DataFrame, components: DataFrame,
                    id_col: str = "doc_id") -> DataFrame:
    """(id, component, is_survivor) — one representative (min id) per
    near-dup component survives; docs absent from the component map are
    their own singleton survivors."""
    joined = (docs.select(F.col(id_col).alias("id"))
              .join(components, "id", "left")
              .select("id", F.coalesce(F.col("component"),
                                       F.col("id")).alias("component")))
    return joined.select(
        "id", "component",
        (F.col("id") == F.col("component")).alias("is_survivor"))


# --- integer fixed-point PageRank (r5) ---------------------------------------

PR_SCALE = 1_000_000  # rank fixed-point scale: rank 1.0 == 1e6


def pagerank_integer(edges: DataFrame, vertices: DataFrame,
                     iters: int = 3, scale: int = PR_SCALE) -> DataFrame:
    """(id, rank) — PageRank in EXACT fixed-point integer arithmetic:
    rank'(v) = floor(0.15*scale) + (85 * S(v)) // 100 with
    S(v) = sum over in-edges (u, v) of rank(u) // outdeg(u).
    Deterministic and engine-portable (every step is a nonnegative
    integer division), so a DuckDB oracle replays all rounds as chained
    CTEs — the same replay pattern as the k-means oracle.

    The distributed-iterative shape (the other one besides connected
    components): per round ONE hash join (edges ⨝ ranks) + ONE
    map-side-combined sum + ONE left join back onto the vertex set;
    lineage truncated per round with localCheckpoint (the plan would
    otherwise grow exponentially — the CC lesson).  Driver state: zero
    (no collect anywhere; iters is a fixed hyperparameter).

    edges: (src, dst) — parallel edges and self-loops count per row;
    vertices: one column of ALL vertex ids (sources, sinks, isolated)."""
    vid = vertices.columns[0]
    verts = vertices.select(F.col(vid).alias("id")).distinct()
    outdeg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("_od"))
    ranks = verts.select("id", F.lit(int(scale)).cast("long").alias("rank")) \
                 .localCheckpoint()
    base = int(15 * scale) // 100
    for _ in range(int(iters)):
        contribs = (edges.join(ranks.withColumnRenamed("id", "src"), "src")
                    .join(outdeg, "src")
                    .select(F.col("dst").alias("id"),
                            F.expr("rank div _od").alias("_c")))
        sums = contribs.groupBy("id").agg(F.sum("_c").alias("_s"))
        ranks = (verts.join(sums, "id", "left")
                 .select("id",
                         (F.lit(base)
                          + F.expr("85 * coalesce(_s, 0L) div 100"))
                         .cast("long").alias("rank"))
                 .localCheckpoint())
    return ranks


def triangle_count(edges: DataFrame, a_col: str = "a",
                   b_col: str = "b") -> DataFrame:
    """Exact triangle counting via degree-ordered wedge closure — ONE row
    (n_nodes, n_edges, n_wedges, n_triangles), all exact int64.

    The input is an undirected graph as edge rows (either direction,
    duplicates and self-loops tolerated: canonicalized here).  Each edge
    is oriented from its lower-(degree, id) endpoint to the higher; a
    wedge is two oriented edges sharing a source, closed by the canonical
    edge between its endpoints.  Every triangle is counted EXACTLY once —
    at its unique minimum-(degree, id) vertex.

    Scale shape: the degree orientation is the whole point — out-degree
    of every node is bounded by O(sqrt(m)) after orienting toward higher
    degree, so the wedge self-join (the quadratic term) generates
    O(m^{3/2}) rows worst-case instead of sum(deg^2) — the standard
    node-iterator bound; hub nodes (degree ~n) contribute ZERO wedges
    because all their edges point inward.  Three shuffles total: degree
    agg, wedge self-join, closing join; nothing driver-side."""
    und = (edges.select(F.least(F.col(a_col), F.col(b_col)).alias("a"),
                        F.greatest(F.col(a_col), F.col(b_col)).alias("b"))
           .filter(F.col("a") != F.col("b")).distinct())
    deg = (und.select(F.col("a").alias("id"))
           .unionByName(und.select(F.col("b").alias("id")))
           .groupBy("id").agg(F.count(F.lit(1)).alias("d")))
    da, db = deg.alias("da"), deg.alias("db")
    first_a = ((F.col("da.d") < F.col("db.d"))
               | ((F.col("da.d") == F.col("db.d")) & (F.col("a") < F.col("b"))))
    o = (und.join(da, F.col("a") == F.col("da.id"))
         .join(db, F.col("b") == F.col("db.id"))
         .select(F.when(first_a, F.col("a")).otherwise(F.col("b")).alias("src"),
                 F.when(first_a, F.col("b")).otherwise(F.col("a")).alias("dst")))
    o1, o2 = o.alias("o1"), o.alias("o2")
    w = (o1.join(o2, (F.col("o1.src") == F.col("o2.src"))
                 & (F.col("o1.dst") < F.col("o2.dst")))
         .select(F.least(F.col("o1.dst"), F.col("o2.dst")).alias("x"),
                 F.greatest(F.col("o1.dst"), F.col("o2.dst")).alias("y")))
    w = w.localCheckpoint()  # consumed twice (count + closing join)
    tri = w.join(und, (F.col("x") == F.col("a")) & (F.col("y") == F.col("b")))
    counts = [und.agg(F.count(F.lit(1)).cast("long").alias("n_edges")),
              deg.agg(F.count(F.lit(1)).cast("long").alias("n_nodes")),
              w.agg(F.count(F.lit(1)).cast("long").alias("n_wedges")),
              tri.agg(F.count(F.lit(1)).cast("long").alias("n_triangles"))]
    out = counts[1].crossJoin(counts[0]).crossJoin(counts[2]) \
                   .crossJoin(counts[3])
    return out.select("n_nodes", "n_edges", "n_wedges", "n_triangles")
