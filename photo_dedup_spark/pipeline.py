"""End-to-end near-duplicate detection pipeline (reference ``scan``).

Stage map (SURVEY.md §3.1, mirroring /root/reference/photo_dedup/
scanner.py:815-978 stage by stage, Spark-first):

  0 ingest      project (doc_id, repo, path, lang, n_chars, content);
                NULL content dropped with a counted error
                (scanner.py:471-479 drop-and-count contract)
  1 exact       raw + normalized sha256 keys (H1/H3/H4)
  2 signatures  MinHash + SimHash pandas UDFs on exact-group
                representatives + singletons only (J6 rep pattern);
                oversize rows fall back to exact-only (hasher.py:109-119)
  3 candidates  LSH band + SimHash-prefix buckets, repartitioned and
                skew-salted self-join (J3), pair dedup
  4 verify      Jaccard/containment pandas UDF + JVM-side Hamming (J5/J8)
  5 components  exact star edges ∪ verified near edges → iterative
                min-label propagation (subsumes hybrid merge J6)
  6 groups      keep-window (W1), dup filter (P3), report structs (S4),
                summary aggregates (A2)

``mode='exact'`` reproduces the reference's ``--no-pixel`` behavior
(scanner.py:861-867 forces exact matching): stages 2-5 are skipped and
clusters are the normalized-key groups.
"""

from __future__ import annotations

import os
import sys
import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from photo_dedup_spark.config import DEFAULT_CONFIG, DedupConfig
from photo_dedup_spark.functions.keys import exact_key_col, norm_key_col
from photo_dedup_spark.functions.normalize import normalize_col
from photo_dedup_spark.functions.signatures import make_signature_struct_udf
from photo_dedup_spark.operators import lsh
from photo_dedup_spark.operators.components import connected_components, exact_star_edges
from photo_dedup_spark.operators.groups import keep_selection
from photo_dedup_spark.operators.verify import verify_pairs


@dataclass
class PipelineResult:
    assignments: DataFrame  # (doc_id, repo, path, lang, n_chars, cluster_id, rn, is_keep)
    edges: DataFrame | None
    metrics: dict


def ingest(
    files: DataFrame,
    cfg: DedupConfig = DEFAULT_CONFIG,
    collect_metrics: bool = True,
) -> tuple[DataFrame, dict]:
    """Stage 0: stable doc ids + null handling.

    doc_id = xxhash64(repo, path, commit) — value-based, deterministic
    under any partitioning.  (At true 10^12 scale this would widen to a
    128-bit key; 64-bit collision odds at 10^9 docs are ~2.7e-2 so the
    id also carries (repo, path) through the pipeline for tie-breaks.)
    """
    m: dict = {}
    if collect_metrics:
        # single pass: count(*) vs count(content) gives the null count
        # without a second scan (scanner.py:471-479 error counting)
        c = files.agg(
            F.count("*").alias("n"), F.count("content").alias("nc")
        ).collect()[0]
        m = {"rows_in": c.n, "null_content_dropped": c.n - c.nc}
    good = files.where(F.col("content").isNotNull())
    docs = good.select(
        F.xxhash64("repo", "path", "commit").alias("doc_id"),
        "repo",
        "path",
        "lang",
        F.col("content"),
        F.length("content").alias("n_chars"),
    )
    return docs, m


def run_pipeline(
    spark: SparkSession,
    files: DataFrame,
    cfg: DedupConfig = DEFAULT_CONFIG,
    mode: str = "hybrid",  # 'exact' | 'hybrid'  (scanner.py:861-867)
    collect_metrics: bool = True,
    strict_verify: bool = False,
) -> PipelineResult:
    """*collect_metrics=False* skips the optional telemetry counts —
    each one is an extra Spark job re-running part of the lineage
    (convergence counts inside CC are intrinsic and always run).

    *strict_verify* (J7, scanner.py:645-695): re-split every cluster by
    the raw sha256 so only byte-identical members share a final cluster
    — the ``--strict-verify`` flag.  Only meaningful in exact mode (in
    hybrid mode near-members are intentionally non-identical)."""
    metrics: dict = {"mode": mode, "config_hash": cfg.config_hash()}

    _trace = os.environ.get("SPARK_GRAFT_STAGE_TIMING") == "1"
    _t = [time.monotonic()]

    def _mark(stage: str) -> None:
        if _trace:
            now = time.monotonic()
            print(f"[stage-timing] {stage}: {now - _t[0]:.1f}s", file=sys.stderr, flush=True)
            _t[0] = now

    docs, ing_m = ingest(files, cfg, collect_metrics)
    metrics.update(ing_m)

    # --- stage 1: exact + normalized keys (pure built-ins, codegen'd)
    keyed = docs.select(
        "doc_id",
        "repo",
        "path",
        "lang",
        "n_chars",
        "content",
        exact_key_col(F.col("content")).alias("exact_key"),
        norm_key_col(F.col("content")).alias("norm_key"),
    )
    keyed = keyed.localCheckpoint(eager=True)
    _mark("keys")

    # exact star edges always exist (normalized-equality groups);
    # in mode='exact' they are the ONLY edges, so components are exactly
    # the normalized-key groups (the --no-pixel semantics)
    star = exact_star_edges(keyed, "norm_key")

    edges = star
    if mode == "hybrid":
        # --- stage 2: signatures on group representatives + singletons.
        # Representative pattern (J6, scanner.py:549-567): one signature
        # per distinct normalized content; members ride along via the
        # star edges.  Oversize rows keep exact keys only
        # (degrade-don't-drop, hasher.py:109-119).
        reps = (
            keyed.withColumn(
                "rep_rn",
                F.row_number().over(
                    Window.partitionBy("norm_key").orderBy("doc_id")
                ),
            )
            .where(F.col("rep_rn") == 1)
            .drop("rep_rn")
        )
        eligible = reps.where(F.col("n_chars") <= cfg.content_cap_chars)
        if collect_metrics:
            n_reps = reps.count()
            metrics["signature_reps"] = n_reps
            metrics["oversize_exact_only"] = n_reps - eligible.count()

        # signed carries ONLY what downstream stages read: band_hashes +
        # simhash chunks feed candidates, (sketch, sketch_b, simhash)
        # feed verify.  Content does not survive this stage — the pair
        # join must never move full text (SURVEY §4.2 select-pruning).
        # no repartition here: reps exit the rep-window shuffle already
        # spread over shuffle_partitions — re-shuffling would move the
        # full content column a second time for nothing
        sign_udf = make_signature_struct_udf(cfg)
        signed = (
            eligible.select(
                "doc_id", normalize_col(F.col("content")).alias("norm_content")
            )
            .withColumn("sig", sign_udf(F.col("norm_content")))
            .select(
                "doc_id",
                F.col("sig.simhash").alias("simhash"),
                F.col("sig.band_hashes").alias("band_hashes"),
                F.col("sig.sketch").alias("sketch"),
                F.col("sig.sketch_b").alias("sketch_b"),
            )
        )
        signed = signed.localCheckpoint(eager=True)
        _mark("signatures")

        # --- stage 3: candidates (LSH bands ∪ SimHash prefixes)
        banded = lsh.explode_bands(signed, cfg).unionByName(
            lsh.explode_simhash_chunks(signed, cfg)
        )
        shuffle_n = int(spark.conf.get("spark.sql.shuffle.partitions"))
        pairs, bucket_stats = lsh.candidate_pairs(banded, cfg, num_partitions=shuffle_n)
        if collect_metrics:
            metrics["lsh_bucket_routes"] = {
                r["route"]: r["n"]
                for r in bucket_stats.groupBy("route")
                .agg(F.count("*").alias("n"))
                .collect()
            }
            metrics["candidate_pairs"] = pairs.count()

        # --- stage 4: verify
        verified = verify_pairs(pairs, signed, cfg)
        near_edges = verified.where(F.col("is_edge")).select("src", "dst")
        near_edges = near_edges.localCheckpoint(eager=True)
        _mark("candidates+verify")
        if collect_metrics:
            metrics["verified_edges"] = near_edges.count()
        edges = star.unionByName(near_edges)

    # --- stage 5: connected components
    nodes = keyed.select("doc_id")
    labels, cc_m = connected_components(nodes, edges, cfg)
    metrics.update(cc_m)
    _mark("components")

    # --- stage 5.5: strict re-split (J7) — composite (cluster, raw sha)
    # key, then re-canonicalize to min doc_id per subgroup so the label
    # domain stays LongType
    if strict_verify:
        relabeled = (
            keyed.select("doc_id", "exact_key")
            .join(labels, "doc_id")
            .withColumn(
                "strict_min",
                F.min("doc_id").over(
                    Window.partitionBy("cluster_id", "exact_key")
                ),
            )
            .select("doc_id", F.col("strict_min").alias("cluster_id"))
        )
        labels = relabeled

    # --- stage 6: keep-selection over members
    members = keyed.select("doc_id", "repo", "path", "lang", "n_chars").join(
        labels, "doc_id"
    )
    selected = keep_selection(members)
    if collect_metrics:
        metrics["clusters"] = labels.select("cluster_id").distinct().count()

    return PipelineResult(assignments=selected, edges=edges, metrics=metrics)
