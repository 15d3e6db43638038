"""Near-duplicate clustering: connected components over a candidate-pair
edge list (the step that turns pairwise LSH/Jaccard matches into dedup
GROUPS, so one representative per component survives).

Algorithm: min-label propagation — every vertex repeatedly takes the
minimum component label among itself and its neighbors until no label
changes.  Each iteration is one hash join (edges ⨝ labels) + one groupBy
min + one full-outer-free left join; convergence needs O(graph diameter)
iterations, and near-dup components are short-diameter by construction
(members of a cluster share bands/shingles with a common core).  For
adversarial long-chain graphs the alternating large-star/small-star
scheme (Kiveris et al., "Connected Components in MapReduce and Beyond")
drops to O(log n) rounds with the same per-round join shape — a drop-in
swap documented here rather than implemented, since near-dup graphs do
not produce long chains.

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
        new_labels = (labels.join(nbr_min, "id", "left")
                      .select("id", F.least(F.col("comp"),
                                            F.coalesce(F.col("nbr_comp"),
                                                       F.col("comp"))).alias("comp"))
                      .localCheckpoint())
        changed = (new_labels.join(labels.withColumnRenamed("comp", "old"), "id")
                   .filter(F.col("comp") != F.col("old")).count())
        labels = new_labels
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
