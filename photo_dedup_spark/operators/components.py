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

import os
import shutil
import tempfile

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

    HYBRID: rep graphs with ≤ ``cfg.cc_driver_max_edges`` edges skip
    the loop entirely and resolve by union-find on the driver (one
    Arrow collect of (src, dst) longs, C-speed find/union, one
    broadcast-joinable label map back) — identical labels, and the
    ~3 jobs/round × O(log n) rounds of serial scheduling latency
    become a single job.  This mirrors the scale design everywhere
    else in the pipeline: distribute what is large (the corpus), keep
    what is provably small (the REP edge set — edges ≪ files for any
    dedup workload) off the cluster's critical path.  The distributed
    loop remains the correctness path for graphs above the threshold
    and is pinned by the same equivalence tests.
    """
    n_edges_capped = edges.limit(cfg.cc_driver_max_edges + 1).count()
    if n_edges_capped <= cfg.cc_driver_max_edges:
        return _driver_union_find(nodes, edges, n_edges_capped)
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

    # Per-check PARQUET round-trip, not localCheckpoint, for the loop
    # feedback.  localCheckpoint truncates lineage but the resulting
    # LogicalRDD INHERITS the pre-checkpoint sizeInBytes estimate, and
    # each round's self-join roughly squares it — so across feedback
    # iterations Catalyst's size estimate compounds exponentially until
    # the driver spends minutes multiplying million-digit BigIntegers
    # inside stats estimation (reproduced: ~x5.5 digits per check; the
    # loop appears to hang by check ~9).  A parquet read is a fresh
    # leaf with REAL file statistics, so estimates reset every check —
    # and the scratch files double as per-iteration lineage for resume
    # diagnostics (north-rule checkpoint story).  The write+read pair
    # replaces the old checkpoint job one-for-one; only graphs above
    # cc_driver_max_edges ever pay it.
    spark = nodes.sparkSession
    scratch = tempfile.mkdtemp(prefix="cc_labels_")

    history: list[int] = []
    rounds_done = 0
    converged = False
    try:
        while rounds_done < cfg.cc_max_iters and not converged:
            cur = labels
            for _ in range(min(cfg.cc_check_every, cfg.cc_max_iters - rounds_done)):
                cur = _one_round(cur)
                rounds_done += 1
            # labels only ever decrease, so comparing against the last
            # materialized state detects any change across the batch
            flagged = (
                cur.alias("n")
                .join(labels.alias("o"), "doc_id")
                .select(
                    "doc_id",
                    F.col("n.cluster_id").alias("cluster_id"),
                    (F.col("n.cluster_id") < F.col("o.cluster_id")).alias("changed"),
                )
            )
            step_path = os.path.join(scratch, f"check_{len(history)}")
            flagged.write.parquet(step_path)
            flagged = spark.read.parquet(step_path)
            n_changed = flagged.where(F.col("changed")).count()
            labels = flagged.select("doc_id", "cluster_id")
            history.append(int(n_changed))
            converged = n_changed == 0
        if not converged:
            raise RuntimeError(
                f"connected_components did not converge in {cfg.cc_max_iters} "
                f"rounds (change history: {history[-5:]})"
            )
        # one final localCheckpoint pins the result in block storage so
        # the scratch dir can be deleted (single feedback-free hop: the
        # inherited-stats compounding above cannot recur)
        labels = labels.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)

    metrics = {
        "cc_iterations": rounds_done,
        "cc_changed_per_iter": history,
        "cc_mode": "distributed",
    }
    return labels, metrics


def _driver_union_find(
    nodes: DataFrame, edges: DataFrame, n_edges: int
) -> tuple[DataFrame, dict]:
    """Driver-side component resolution for small rep graphs: one Arrow
    collect, vectorized numpy min-label propagation with pointer
    jumping (labels decrease monotonically ⇒ guaranteed fixpoint in
    O(log n) rounds), one label map joined back to the distributed
    ``nodes`` frame.  Produces the same value-based label as the
    distributed loop: min doc_id per component."""
    import numpy as np
    import pandas as pd

    spark = nodes.sparkSession
    if n_edges == 0:
        labels = nodes.select("doc_id", F.col("doc_id").alias("cluster_id"))
        return labels, {
            "cc_iterations": 0,
            "cc_changed_per_iter": [],
            "cc_mode": "driver-union-find",
            "cc_driver_edges": 0,
        }

    epd = edges.select(
        F.col("src").cast("long"), F.col("dst").cast("long")
    ).toPandas()
    src = epd["src"].to_numpy(dtype=np.int64)
    dst = epd["dst"].to_numpy(dtype=np.int64)
    ids = np.unique(np.concatenate([src, dst]))  # sorted ⇒ index order = id order
    e1 = np.searchsorted(ids, src)
    e2 = np.searchsorted(ids, dst)
    lab = np.arange(len(ids), dtype=np.int64)
    history: list[int] = []
    while True:
        prev = lab.copy()
        m = np.minimum(lab[e1], lab[e2])
        np.minimum.at(lab, e1, m)
        np.minimum.at(lab, e2, m)
        lab = lab[lab]  # pointer jump: label <- label(label)
        changed = int((lab != prev).sum())
        history.append(changed)
        if changed == 0:
            break
    mapping = spark.createDataFrame(
        pd.DataFrame({"doc_id": ids, "cluster_id": ids[lab]})
    )
    labels = nodes.join(mapping, "doc_id", "left").select(
        "doc_id",
        F.coalesce(F.col("cluster_id"), F.col("doc_id")).alias("cluster_id"),
    )
    return labels, {
        "cc_iterations": len(history),
        "cc_changed_per_iter": history,
        "cc_mode": "driver-union-find",
        "cc_driver_edges": n_edges,
    }
