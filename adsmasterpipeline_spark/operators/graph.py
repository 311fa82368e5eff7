"""Connected components over the duplicate-pair graph.

Pair-emitting dedup (MinHash-LSH, SimHash, exact-Jaccard) is only half
the job: a training pipeline must resolve pairs into CLUSTERS and keep
one document per cluster. A near-dup graph's components are exactly
those clusters.

``connected_components`` is iterative min-label propagation expressed
as DataFrame joins: each round every node adopts the smallest label in
its neighborhood, then follows its label's own label (pointer jumping
— path compression as a node-keyed self-join), halving any remaining
chain each round. Convergence is reached when no label changes, after
O(log diameter) rounds; duplicate clusters are near-cliques from
banding, so in practice that's 2-4 rounds at any corpus size.

Scale posture per round: one shuffle keyed on node id (the groupBy),
edges re-broadcast-joined against the (id, label) table; lineage is cut
with localCheckpoint each round so the plan does not grow with the
iteration count (at cluster scale: checkpoint to the shuffle service or
a lake table instead).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(edges: DataFrame, src: str = "src",
                         dst: str = "dst", max_iter: int = 20,
                         rounds_out: list | None = None,
                         driver_cap: int = 1 << 20) -> DataFrame:
    """Resolve undirected ``edges`` into components.

    Returns (id, component) where ``component`` is the smallest node id
    reachable from ``id`` — a deterministic canonical representative.
    Isolated nodes don't appear in ``edges`` and so don't appear here;
    callers left-join and coalesce(component, id).

    ``rounds_out``: optional list that receives the number of rounds
    actually run (convergence telemetry — tests pin the O(log diameter)
    bound with it; the driver path reports 0 rounds).

    ``driver_cap``: when the deduped symmetric edge list has at most
    this many rows, the components are resolved with driver-side
    union-find instead of the iterative join loop — the same
    size-adaptive cutover as learn_bpe's merge loop and the GEMM
    strategy switch. The label-propagation rounds are pure scheduler
    latency on a small graph (6 rounds x ~1 s of tiny shuffle jobs on
    the sf0.1 dup graph vs ~0.2 s of union-find over a bounded
    collect: <= cap x 16 B = 16 MB at the default), while above the
    cap the distributed loop — the 100-TB regime — is unchanged. Both
    paths compute the identical fixed point (min reachable id), and
    a test pins them equal.
    """
    sym = (edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
           .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
           .where(F.col("a") != F.col("b"))
           .distinct()
           .localCheckpoint(eager=True))

    if sym.count() <= driver_cap:
        # union-find with path compression + union by root id; the
        # canonical representative is forced to the component minimum
        # afterwards, so the result matches the propagation fixed
        # point exactly, independent of edge order
        parent: dict = {}

        def find(x):
            r = x
            while parent[r] != r:
                r = parent[r]
            while parent[x] != r:
                parent[x], x = r, parent[x]
            return r

        for a, b in sym.select("a", "b").toLocalIterator():
            if a not in parent:
                parent[a] = a
            if b not in parent:
                parent[b] = b
            ra, rb = find(a), find(b)
            if ra != rb:
                # root at the smaller id: the final min-relabel pass
                # makes this a no-op for correctness, but it keeps
                # trees shallow deterministically
                if rb < ra:
                    ra, rb = rb, ra
                parent[rb] = ra
        comp_min: dict = {}
        for x in parent:
            r = find(x)
            if r not in comp_min or x < comp_min[r]:
                comp_min[r] = x
        rows = [(x, comp_min[find(x)]) for x in parent]
        if rounds_out is not None:
            rounds_out.append(0)
        id_type = sym.schema["a"].dataType
        from pyspark.sql.types import StructField, StructType
        schema = StructType([StructField("id", id_type),
                             StructField("component", id_type)])
        return edges.sparkSession.createDataFrame(rows, schema)

    labels = (sym.select(F.col("a").alias("id"))
              .distinct()
              .withColumn("component", F.col("id")))

    rounds = 0
    for _ in range(max_iter):
        rounds += 1
        # TWO propagation hops per checkpointed round, unrolled in one
        # lazy plan: the min label floods one graph edge per hop, and
        # once a region settles on a local minimum progress is pure
        # edge-flooding (pointer jumping can't shortcut it — measured
        # identical round counts with 1 vs 3 jumps). Unrolling halves
        # the number of checkpoint + convergence-count actions for the
        # same fixed point: 10 -> 6 rounds, 6.9 -> 3.6 s on the sf0.1
        # dup graph. Lineage is still cut once per round.
        propagated = labels
        for _hop in range(2):
            # neighbor labels: node a hears the label of each neighbor b
            heard = (sym.join(propagated.withColumnRenamed("id", "b"), "b")
                     .select(F.col("a").alias("id"), "component"))
            propagated = (propagated.unionByName(heard)
                          .groupBy("id")
                          .agg(F.min("component").alias("component")))
        # pointer jumping (path compression): follow the label's own
        # label — every label is a node id, so this node-keyed self-join
        # collapses label chains toward their local minimum
        parents = propagated.select(F.col("id").alias("component"),
                                    F.col("component").alias("_parent"))
        new_labels = (propagated.join(parents, "component", "left")
                      .select("id",
                              F.coalesce("_parent", "component")
                              .alias("component"))
                      .localCheckpoint(eager=True))
        changed = (new_labels.alias("n")
                   .join(labels.alias("o"), "id")
                   .where(F.col("n.component") != F.col("o.component"))
                   .count())
        labels = new_labels
        if changed == 0:
            break
    else:
        # silently returning unconverged labels would split one
        # duplicate cluster into several and keep extra copies — fail
        # loudly instead (with pointer jumping, max_iter=20 covers
        # diameters up to ~2^20, so this only fires on misuse)
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds")
    if rounds_out is not None:
        rounds_out.append(rounds)
    return labels


def dedup_clusters(pairs: DataFrame, all_ids: DataFrame,
                   id_a: str = "id_a", id_b: str = "id_b",
                   id_col: str = "doc_id") -> DataFrame:
    """Cluster assignment for every document: component representative
    (min id) as cluster_id, cluster size, and the keeper flag — the
    keep-one-per-cluster decision a dedup pipeline feeds downstream."""
    comp = connected_components(pairs, id_a, id_b)
    out = (all_ids.select(F.col(id_col))
           .join(comp.withColumnRenamed("id", id_col), id_col, "left")
           .select(id_col,
                   F.coalesce("component", F.col(id_col)).alias("cluster_id")))
    sizes = out.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("cluster_size"))
    return (out.join(sizes, "cluster_id")
            .select(id_col, "cluster_id", "cluster_size",
                    (F.col(id_col) == F.col("cluster_id")).alias("is_keeper")))
