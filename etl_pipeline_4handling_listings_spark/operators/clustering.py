"""Connected components for near-duplicate clustering.

The step after candidate generation in a dedup pipeline: LSH gives
PAIRS; keeping one document per duplicate *group* requires the
transitive closure of those pairs. This is iterative min-label
propagation over the edge list — the standard large-graph CC
algorithm (each iteration: every vertex adopts the smallest label
in its neighborhood; converges in O(component diameter) rounds).

Scale: each iteration is one join + one aggregate on the edge list
(shuffle on vertex id). Near-dup graphs are overwhelmingly tiny
disjoint cliques, so diameters are small; ``max_iter`` bounds the
driver loop and convergence is detected with an exact changed-count
(cheap: it aggregates the label frame, not the data).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def connected_components(
    vertices: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    src_col: str = "id_a",
    dst_col: str = "id_b",
    max_iter: int = 15,
) -> DataFrame:
    """Label every vertex with the smallest vertex id reachable from
    it. Returns (id, component).

    ``vertices``: one column ``id_col``; ``edges``: undirected pairs
    (each edge listed once is fine).
    """
    # symmetric edge list — the LOOP INVARIANT: partition (and sort)
    # it on the join key BEFORE freezing (the graph_pagerank
    # pattern), so at scale every round's sort-merge join exchanges
    # and sorts only the label side; locally the label side
    # broadcasts and the layout is simply the materialized edge
    # frame each round re-reads
    e = edges.select(
        F.col(src_col).alias("_src"), F.col(dst_col).alias("_dst")
    )
    sym = (
        e.unionByName(
            e.select(F.col("_dst").alias("_src"), F.col("_src").alias("_dst"))
        )
        .repartition("_dst")
        .sortWithinPartitions("_dst")
        .localCheckpoint(eager=True)
    )

    labels = vertices.select(
        F.col(id_col).alias("_id"), F.col(id_col).alias("_label")
    ).persist()
    label_type = labels.schema["_label"].dataType

    changed = -1
    for _ in range(max_iter):
        # ONE join + ONE aggregate per round: neighbor-candidate
        # labels union the vertex's own label row (tagged as _old)
        # and a single min/max aggregate yields the new label, the
        # previous label, and with them the changed flag — the old
        # shape's separate left join back onto the label frame (a
        # third keyed exchange per round) is folded into the same
        # aggregate. Vertices without neighbors still converge: their
        # self row is the only input, min == prev.
        cand = (
            sym.join(labels, sym["_dst"] == labels["_id"])
            .select(
                F.col("_src").alias("_id"),
                "_label",
                F.lit(None).cast(label_type).alias("_old"),
            )
        )
        merged = cand.unionByName(
            labels.select("_id", "_label", F.col("_label").alias("_old"))
        )
        updated = (
            merged.groupBy("_id")
            .agg(
                F.min("_label").alias("_label"),
                # exactly one self row per vertex carries non-null _old
                F.max("_old").alias("_prev"),
            )
            .withColumn("_changed", F.col("_label") < F.col("_prev"))
        )
        # localCheckpoint (eager) BOTH materializes the round (like
        # persist+count did) AND truncates plan lineage — without it
        # the logical plan nests one join deeper per round and
        # analyzer/optimizer time grows quadratically with rounds.
        # The convergence probe rides the SAME action as an observed
        # metric: a separate count() paid one extra job per round
        # (pure scheduling latency — the label frame is tiny next to
        # the propagation join the checkpoint already ran).
        obs = Observation()
        updated = updated.observe(
            obs, F.count(F.when(F.col("_changed"), 1)).alias("n_changed")
        )
        updated = updated.localCheckpoint(eager=True)
        changed = int(obs.get["n_changed"])
        labels.unpersist()
        labels = updated.select("_id", "_label")
        if changed == 0:
            break
    if changed != 0:
        # A component with diameter > max_iter would get silently
        # wrong labels; fail loudly instead of returning them.
        labels.unpersist()
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} "
            f"iterations ({changed} labels still changing); raise max_iter"
        )
    return labels.select(F.col("_id").alias(id_col), F.col("_label").alias("component"))


def dedup_representatives(
    vertices: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    src_col: str = "id_a",
    dst_col: str = "id_b",
) -> DataFrame:
    """(id, cluster_rep): the canonical (minimum-id) member of each
    near-duplicate cluster; singletons represent themselves. Filter
    ``id != cluster_rep`` to drop duplicates, keep one per group."""
    cc = connected_components(
        vertices.select(F.col(id_col).alias("id")),
        pairs,
        id_col="id",
        src_col=src_col,
        dst_col=dst_col,
    )
    return cc.select(F.col("id").alias(id_col), F.col("component").alias("cluster_rep"))
