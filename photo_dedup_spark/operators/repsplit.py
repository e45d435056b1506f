"""Per-component representative-verify split (the CC-then-verify split).

The reference never ships a connected component as one group: within
each component it re-verifies members against subgroup REPRESENTATIVES
in order — a member joins the first subgroup whose founding rep it
matches, else founds a new subgroup (/root/reference/photo_dedup/
scanner.py:382-395; the A≈B≈C chain must split at C, pinned by
reference tests/test_core.py:1769-1818).  Transitive closure alone
over-merges boilerplate chains; this operator restores the reference's
precision semantics.

Distributed formulation: components are the parallel unit.  The
component id partitions an ``applyInPandas`` grouped-map; inside a
group the greedy runs sequentially over members sorted by
``(repo, path)`` — the same deterministic order the sequential oracle
uses (photo_dedup_spark/oracle.py:125-144), so subject and referee
produce identical subgroups.  The verifier is the same sketch
Jaccard/containment estimator as the pair-verify stage (verify stage
proposes, the SAME estimator disposes here — mirroring the reference
where dHash proposes and RMS decides both the edges and the split).

Scale: components in a near-dup graph are small (the verify threshold
bounds them), but vendored-boilerplate chains can snowball into
megacomponents, and the greedy is worst-case quadratic in its group —
so no single Python task may ever receive an unbounded group.  Two
tiers enforce that:

  * components ≤ ``cfg.split_max_component`` run the exact
    oracle-order greedy (the common case, deterministic parity with
    the sequential oracle);
  * larger components are hierarchically PRE-BUCKETED by SimHash
    prefix — near-identical docs share their high simhash bits, so a
    b-bit prefix keeps a true near-dup pair co-bucketed with
    probability ≈ (1 − hamming/256)^b while cutting the group into
    ~2^b independent greedy tasks.  Prefix bits scale with the
    component: b = clamp(ceil(log2(n / split_bucket_target)), 1, 16).
    A still-oversized bucket (pathological skew) degrades to one
    unsplit cluster — degrade-don't-drop, COUNTED via
    :func:`oversized_component_count`, never a silent stall.

Bucketing can only over-split (buckets never merge), which preserves
the split's precision role; the recall cost applies to megacomponents
only and is the logged, bounded alternative to a multi-hour
single-task straggler.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from photo_dedup_spark.config import DEFAULT_CONFIG, DedupConfig
from photo_dedup_spark.functions.signatures import sketch_from_bytes, sketch_overlap_py

_SPLIT_SCHEMA = "doc_id long, cluster_id long"


def rep_verify_split(
    comp_labels: DataFrame,
    reps: DataFrame,
    cfg: DedupConfig = DEFAULT_CONFIG,
) -> DataFrame:
    """(rep doc_id, component id) × (rep doc_id, repo, path, sketch,
    sketch_b, simhash) → (doc_id, cluster_id) with cluster_id = the
    founding member's doc_id of the rep's subgroup.

    *comp_labels*: (doc_id, cluster_id) from connected components over
    verified near edges (reps only).  *reps*: per-rep signature rows.
    """
    tau_j = cfg.jaccard_threshold
    tau_c = cfg.containment_threshold
    cap = cfg.split_max_component
    target = cfg.split_bucket_target

    sizes = comp_labels.groupBy("cluster_id").agg(F.count("*").alias("comp_n"))
    members = (
        comp_labels.select("doc_id", F.col("cluster_id").alias("comp_id"))
        .join(
            reps.select("doc_id", "repo", "path", "sketch", "sketch_b", "simhash"),
            "doc_id",
        )
        .join(sizes.select(F.col("cluster_id").alias("comp_id"), "comp_n"), "comp_id")
    )
    # SimHash-prefix bucket for oversized components; 0 (single bucket,
    # exact oracle-order greedy) for everything under the cap
    members = members.withColumn(
        "_split_bits",
        F.least(
            F.lit(16),
            F.greatest(
                F.lit(1),
                F.ceil(F.log2(F.col("comp_n") / F.lit(float(target)))).cast("int"),
            ),
        ),
    ).withColumn(
        "bucket",
        F.when(F.col("comp_n") <= F.lit(cap), F.lit(0).cast("long")).otherwise(
            F.expr(
                "shiftrightunsigned(coalesce(simhash[0], CAST(0 AS BIGINT)),"
                " 64 - _split_bits)"
            )
        ),
    )

    def _split(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) > cap:
            # still-oversized bucket: one cluster, deterministic label
            return pd.DataFrame(
                {"doc_id": pdf["doc_id"], "cluster_id": pdf["doc_id"].min()}
            )
        pdf = pdf.sort_values(["repo", "path"])  # oracle iteration order
        founders: list[tuple[int, object, int]] = []  # (doc_id, sketch, b)
        out_ids, out_labels = [], []
        for row in pdf.itertuples(index=False):
            sk = None if row.sketch is None else sketch_from_bytes(row.sketch)
            label = None
            if sk is not None:
                for fid, fsk, fb in founders:
                    try:
                        j, c = sketch_overlap_py(fsk, fb, sk, int(row.sketch_b))
                    except Exception:
                        continue  # verifier failure ⇒ don't merge (inf contract)
                    if j >= tau_j or c >= tau_c:
                        label = fid
                        break
            if label is None:
                label = int(row.doc_id)
                if sk is not None:
                    founders.append((label, sk, int(row.sketch_b)))
            out_ids.append(int(row.doc_id))
            out_labels.append(label)
        return pd.DataFrame({"doc_id": out_ids, "cluster_id": out_labels})

    return members.groupBy("comp_id", "bucket").applyInPandas(_split, _SPLIT_SCHEMA)


def oversized_component_count(comp_labels: DataFrame, cfg: DedupConfig) -> int:
    """Metric: components routed to SimHash-prefix pre-bucketing
    (logged, never silent)."""
    return (
        comp_labels.groupBy("cluster_id")
        .agg(F.count("*").alias("n"))
        .where(F.col("n") > cfg.split_max_component)
        .count()
    )
