"""Connected components via iterative DataFrame min-label propagation.

Replaces the reference's driver-side BFS over an adjacency dict
(/root/reference/photo_dedup/scanner.py:286-310, built at 359-368) with
the distributed formulation named by the north rule: an iterative
hash-join label-propagation loop with lineage breaks.

Also subsumes the reference's subtlest logic — the hybrid group merge
(scanner.py:583-622), where exact groups linked through a representative
by a verified similar pair are folded together: we union exact-group
*star edges* (member ↔ group-min member) with verified near-dup edges
and let CC produce the merged clusters (SURVEY.md §2.4 J6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from photo_dedup_spark.config import DEFAULT_CONFIG, DedupConfig


def exact_star_edges(keyed: DataFrame, key_col: str = "norm_key") -> DataFrame:
    """(doc_id, key) -> star edges (src=group min doc_id, dst=member).

    Star topology keeps edge count linear in group size (a clique would
    be quadratic) while producing identical components.
    """
    w_min = keyed.groupBy(key_col).agg(F.min("doc_id").alias("root"))
    return (
        keyed.join(w_min, key_col)
        .where(F.col("doc_id") != F.col("root"))
        .select(F.col("root").alias("src"), F.col("doc_id").alias("dst"))
    )


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    cfg: DedupConfig = DEFAULT_CONFIG,
) -> tuple[DataFrame, dict]:
    """Min-label propagation until fixpoint.

    *nodes*: (doc_id); *edges*: (src, dst) undirected.
    Returns ((doc_id, cluster_id), metrics) where cluster_id is the
    minimum doc_id in the component — a value-based, partition-order-free
    label (determinism contract, SURVEY.md §7.3).

    The loop's only blocking actions are the convergence checks: every
    ``cfg.cc_check_every`` rounds, one ``localCheckpoint`` materializes
    the (lazy) rounds since the last check and one changed-count scan
    tests the fixpoint — batching the checks halves the job/barrier
    count that was the loop's serial fraction, at the cost of at most
    one redundant round after convergence.  Per-check change counts
    land in the metrics dict (the convergence telemetry the north rule
    asks for).
    """
    sym = (
        edges.select("src", "dst")
        .unionByName(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
    )
    sym = sym.localCheckpoint(eager=True)

    def _one_round(labels: DataFrame) -> DataFrame:
        # (a) neighbor minimum: for each dst, min label among neighbors
        neighbor_min = (
            sym.join(labels, sym.src == labels.doc_id)
            .groupBy(sym.dst.alias("doc_id"))
            .agg(F.min("cluster_id").alias("nbr_min"))
        )
        propagated = labels.join(neighbor_min, "doc_id", "left").select(
            "doc_id",
            F.least(
                F.col("cluster_id"), F.coalesce(F.col("nbr_min"), F.col("cluster_id"))
            ).alias("cluster_id"),
        )
        # (b) pointer jumping: label(x) <- label(label(x)) — halves label
        # chain depth, turning O(diameter) propagation into O(log n)
        # (the large-star contraction of Kiveris et al.'s CC-MR family)
        parents = propagated.select(
            F.col("doc_id").alias("p_id"), F.col("cluster_id").alias("p_label")
        )
        return propagated.join(
            parents, propagated.cluster_id == parents.p_id, "left"
        ).select(
            "doc_id",
            F.coalesce(F.col("p_label"), F.col("cluster_id")).alias("cluster_id"),
        )

    labels = nodes.select("doc_id", F.col("doc_id").alias("cluster_id"))
    labels = labels.localCheckpoint(eager=True)

    history: list[int] = []
    rounds_done = 0
    converged = False
    while rounds_done < cfg.cc_max_iters and not converged:
        cur = labels
        for _ in range(min(cfg.cc_check_every, cfg.cc_max_iters - rounds_done)):
            cur = _one_round(cur)
            rounds_done += 1
        # labels only ever decrease, so comparing against the last
        # checkpoint detects any change across the whole batch of rounds
        flagged = (
            cur.alias("n")
            .join(labels.alias("o"), "doc_id")
            .select(
                "doc_id",
                F.col("n.cluster_id").alias("cluster_id"),
                (F.col("n.cluster_id") < F.col("o.cluster_id")).alias("changed"),
            )
            .localCheckpoint(eager=True)
        )
        n_changed = flagged.where(F.col("changed")).count()
        labels = flagged.select("doc_id", "cluster_id")
        history.append(int(n_changed))
        converged = n_changed == 0
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge in {cfg.cc_max_iters} "
            f"rounds (change history: {history[-5:]})"
        )

    metrics = {"cc_iterations": rounds_done, "cc_changed_per_iter": history}
    return labels, metrics
