"""Distributed connected components for dedup clustering.

Near-dup pair generation (s02/s03/s09) emits *edges*; an actual dedup
pass needs *clusters*: the transitive closure of "is a near-dup of",
one canonical document per component. The reference has nothing like
this (its dedup surface is zero); this is the beyond-reference
training-data mandate.

Algorithm: iterative min-label propagation with pointer jumping.
Each round every node takes the minimum label over itself and its
neighbors (one shuffle: edge-join + groupBy), then compresses paths by
replacing its label with its label's label (one self-join). The
neighbor step alone needs O(diameter) rounds; the pointer-jumping step
halves label-chain depth each round, giving O(log n) rounds total —
the same convergence bound as the large-star/small-star algorithm
(Kiveris et al., "Connected Components in MapReduce and Beyond",
SoCC'14). Near-dup components are dense and shallow in practice, so
convergence is typically 2-3 rounds.

Scale notes (100 TB):
- The edge list is localCheckpoint-ed once up front: every round joins
  it, and without materialization the (expensive) pair-generation
  subtree would re-run per round. On a cluster, persist(MEMORY_AND_DISK)
  or a checkpoint to the shuffle service plays the same role.
- Labels are localCheckpoint-ed each round to cut lineage — an
  iterative plan otherwise grows by two joins per round and chokes the
  optimizer (same pattern as the k-means loop in operators/vector.py).
- Convergence is detected by the sum of labels: min-label updates are
  monotone non-increasing, so an unchanged sum (one lightweight agg
  action per round) proves a fixpoint. No row-level diff join needed.
- Each round is two shuffles on the node id; AQE handles the skew of
  popular labels. Component count and sizes are unbounded in general,
  but label state is exactly one row per node — never per edge.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["connected_components", "orient_by_degree",
           "symmetrize_edges"]


def symmetrize_edges(pairs: DataFrame, src_in: str, dst_in: str,
                     src: str = "src", dst: str = "dst",
                     carry: tuple[str, ...] = ()) -> DataFrame:
    """Both directions of an undirected edge list from ONE pass over
    ``pairs`` — explode of a two-struct array, the idiom
    ``connected_components`` uses for its own ``und``.

    A union of two selects reads the pair subtree once per branch, and
    when the symmetric list is the thing being materialized (the
    eager-checkpoint-then-iterate pattern of s40/s43/t37) the branches
    evaluate inside ONE job, where neither lazy checkpoints nor
    exchange reuse fence the second branch — controlled A/B at 30x
    replication (SCALING.md round-7 section): s40 end-to-end 554 s
    (union) vs 293 s (explode), of which materializing the same
    10.4 M-row edge list is 282 s.  ``carry`` columns ride along
    unchanged in both directions.
    """
    extras = [F.col(c) for c in carry]
    return (pairs.select(F.explode(F.array(
                F.struct(F.col(src_in).alias(src),
                         F.col(dst_in).alias(dst), *extras),
                F.struct(F.col(dst_in).alias(src),
                         F.col(src_in).alias(dst), *extras)))
            .alias("e"))
            .select("e.*"))


def orient_by_degree(edges: DataFrame, src: str = "d1",
                     dst: str = "d2",
                     degrees: DataFrame | None = None) -> DataFrame:
    """Re-orient undirected edges by the (degree, id) total order.

    Returns one row per input edge with columns ``(src, dst)`` such
    that (degree(src), src) < (degree(dst), dst). Under this
    orientation every vertex's OUT-degree is O(sqrt(m)) — a vertex
    with out-degree d has d neighbors of rank >= its own, so
    rank-order out-degree is bounded by the count of vertices of
    degree >= d, and d * d <= sum(degrees) = 2m — which caps the
    fan-out of a wedge join (the Ortmann/Brandes "degree ordering"
    used by every scalable triangle counter). Plain id orientation
    lacks this bound: a low-id hub keeps its full fan-out.

    Cost: one degree aggregate over the edge list + two equi-joins to
    attach endpoint degrees — both shuffles on the vertex id, skew
    handled by AQE. Pass ``degrees`` (columns ``v, deg``) to reuse an
    already-computed undirected degree table; it MUST cover every
    endpoint of ``edges`` — a stale/filtered table would otherwise
    silently drop edges, so the join is left + assert_true (fails the
    job loudly on the first uncovered endpoint instead of
    undercounting triangles downstream). The triangle SET is
    orientation-invariant, so results of downstream wedge counting do
    not change.
    """
    deg = degrees if degrees is not None else (
        edges.select(F.explode(F.array(src, dst)).alias("v"))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("deg")))
    d1 = deg.select(F.col("v").alias(src), F.col("deg").alias("deg1"))
    d2 = deg.select(F.col("v").alias(dst), F.col("deg").alias("deg2"))
    # The coverage check lives INSIDE the consumed expressions (a
    # dropped side-column would be pruned away with its assertion).
    msg = ("orient_by_degree: degrees table does not cover every "
           "edge endpoint")

    def checked(c: Column) -> Column:
        return F.when(c.isNotNull(), c).otherwise(
            F.raise_error(F.lit(msg)).cast("long"))

    ranked = (edges.join(d1, src, "left").join(d2, dst, "left")
              .withColumn("deg1", checked(F.col("deg1")))
              .withColumn("deg2", checked(F.col("deg2"))))
    fwd = (F.col("deg1") < F.col("deg2")) | (
        (F.col("deg1") == F.col("deg2")) & (F.col(src) < F.col(dst)))
    return ranked.select(
        F.when(fwd, F.col(src)).otherwise(F.col(dst)).alias(src),
        F.when(fwd, F.col(dst)).otherwise(F.col(src)).alias(dst))


def connected_components(nodes: DataFrame, edges: DataFrame,
                         node_col: str, src: str, dst: str,
                         max_iter: int = 25) -> DataFrame:
    """Label every node with the minimum node id of its component.

    ``nodes`` must contain every vertex (isolated nodes become their
    own singleton component); ``edges`` is undirected input given in
    one direction. Returns ``(node_col, component_id)``.
    """
    from mousedatapipeline_spark.tables import pin_keyed

    # Both edge directions from ONE pass over the (possibly expensive)
    # edge subtree: a union of two selects would evaluate the pair-
    # generation plan twice — Spark does not share non-materialized
    # subtrees between union branches. The materializing checkpoint
    # runs under the normal (AQE) planner; past broadcast scale the
    # layout is then re-pinned BY THE PER-ROUND JOIN KEY (v), so each
    # round's |E|-row join side needs no Exchange and no Sort — an
    # unpinned checkpoint (UnknownPartitioning) would re-shuffle the
    # edges once per round, O(rounds x |E|) bytes (guide §2.2/§2.4;
    # see pin_keyed for the broadcast-threshold gate that keeps this
    # an identity at label-table-broadcastable scale).
    und = pin_keyed(
        edges.select(F.explode(F.array(
            F.struct(F.col(src).alias("u"), F.col(dst).alias("v")),
            F.struct(F.col(dst).alias("u"), F.col(src).alias("v"))))
            .alias("e"))
        .select("e.u", "e.v"),
        ["v"])
    # Only nodes with at least one edge enter the loop: isolated nodes
    # (the vast majority of a deduped corpus) are their own component
    # by definition and would just pad every per-round shuffle. At
    # 100 TB this shrinks the iterated state from |corpus| to |docs
    # with a near-dup|.
    # Initialization doubles as round one: lbl = min(self, neighbors)
    # comes out of the same shuffle that dedups the active-node set.
    labels = (und.groupBy("u")
              .agg(F.least(F.col("u"), F.min("v")).alias("lbl"))
              .withColumnRenamed("u", "id")
              .localCheckpoint(eager=False))
    prev_sum = None
    for _ in range(max_iter):
        neigh = (und.join(labels, und.v == labels.id)
                 .groupBy("u").agg(F.min("lbl").alias("nlbl")))
        stepped = (labels.join(neigh, labels.id == neigh.u, "left")
                   .select(labels.id,
                           F.least(labels.lbl,
                                   F.coalesce("nlbl", labels.lbl))
                           .alias("lbl")))
        # Pointer jump against the PREVIOUS (checkpointed) label table,
        # not against `stepped`: a stepped-vs-stepped self-join would
        # recompute the whole neighbor-min subtree on both sides (Spark
        # does not share non-materialized subtrees between join
        # branches). prev(x) <= x for every node id x, so the jump is
        # still a monotone improvement and the fixpoint is unchanged:
        # stable labels mean both edge endpoints agree, and the common
        # label is a member id <= the member min, i.e. the min itself.
        parent = labels.select(F.col("id").alias("pid"),
                               F.col("lbl").alias("plbl"))
        jumped = (stepped.join(parent, stepped.lbl == parent.pid)
                  .select(stepped.id,
                          F.least(stepped.lbl, F.col("plbl"))
                          .alias("lbl")))
        # Lazy checkpoint + the convergence agg as its materializing
        # action: one job per round, and the lineage is still cut.
        labels = jumped.localCheckpoint(eager=False)
        cur_sum = labels.agg(F.sum("lbl")).collect()[0][0]
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds")
    looped = labels.select(F.col("id").alias(node_col),
                           F.col("lbl").alias("component_id"))
    singletons = (nodes.join(labels, nodes[node_col] == labels.id,
                             "left_anti")
                  .select(F.col(node_col),
                          F.col(node_col).alias("component_id")))
    return looped.union(singletons)
