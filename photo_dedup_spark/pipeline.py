"""End-to-end near-duplicate detection pipeline (reference ``scan``).

Stage map (SURVEY.md §3.1, mirroring /root/reference/photo_dedup/
scanner.py:815-978 stage by stage, Spark-first):

  0 ingest      project (doc_id, repo, path, lang, n_chars, content);
                NULL content dropped with a counted error
                (scanner.py:471-479 drop-and-count contract)
  1 exact       raw + normalized sha256 keys (H1/H3/H4); per-group
                representative = min (repo, path) member (the
                reference's ``files[0]`` after sort, scanner.py:550)
  2 signatures  MinHash + SimHash pandas UDFs on exact-group
                representatives only (J6 rep pattern);
                oversize reps fall back to exact-only (hasher.py:109-119)
  3 candidates  LSH band + SimHash-prefix buckets, inline in-bucket
                pair expansion + skew-salted cell join (J3); pair dedup
                folds into the verify tiles
  4 verify      block-tiled sketch Jaccard/containment + Hamming
                (J5/J8) — sketches ship per (doc, tile), not per pair
  5 components  connected components over verified REP edges only —
                the rep graph is orders of magnitude smaller than the
                doc table, so the iterative loop never touches members
  5.5 split     per-component representative-verify split
                (scanner.py:382-395; operators/repsplit.py) — restores
                the reference's chain-split precision semantics
  6 groups      members inherit their rep's subgroup (the hybrid merge
                J6: exact groups linked through reps fold together);
                keep-window (W1), dup filter (P3), report structs (S4),
                summary aggregates (A2)

``mode='exact'`` reproduces the reference's ``--no-pixel`` behavior
(scanner.py:861-867 forces exact matching): stages 2-5.5 are skipped
and clusters are exactly the normalized-key groups — no iteration, no
shuffle beyond one hash aggregation.
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
from photo_dedup_spark.operators.components import connected_components
from photo_dedup_spark.operators.groups import keep_selection
from photo_dedup_spark.operators.repsplit import (
    oversized_component_count,
    rep_verify_split,
)
from photo_dedup_spark.operators.verify import verify_pairs


@dataclass
class PipelineResult:
    assignments: DataFrame  # (doc_id, repo, path, lang, n_chars, cluster_id, rn, is_keep)
    edges: DataFrame | None
    metrics: dict


def _input_bytes(files: DataFrame) -> int | None:
    """Total on-disk size of the scan feeding *files*, or None when it
    cannot be established cheaply (non-file source, synthesized frame,
    remote filesystem).  Used only to decide whether the rep table is
    safely broadcastable — None degrades to the shuffle-join path."""
    try:
        paths = files.inputFiles()
    except Exception:  # non-scan plans (createDataFrame, streaming)
        return None
    if not paths:
        return None
    total = 0
    for p in paths:
        if p.startswith("file:"):
            p = p[5:]
            while p.startswith("//"):
                p = p[1:]
        elif "://" in p:
            return None  # remote FS: no cheap local stat — no hint
        try:
            total += os.path.getsize(p)
        except OSError:
            return None
    return total


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
    mode: str = "hybrid",  # 'exact' | 'similar' | 'hybrid'  (scanner.py:852-867)
    collect_metrics: bool = True,
    strict_verify: bool = False,
) -> PipelineResult:
    """*mode* mirrors the reference's ``image_match`` triple
    (scanner.py:852-856, invalid values raise like
    InvalidParameterError).  'similar' runs the same distributed path
    as 'hybrid': in the reference they differ only in WHICH files reach
    the dHash stage (all vs pixel-unmatched + reps) — under the
    representative pattern + CC + rep-verify split, both produce
    identical clusters, because exact-equal docs always share their
    rep's subgroup.

    *collect_metrics=False* skips the optional telemetry counts —
    each one is an extra Spark job re-running part of the lineage
    (convergence counts inside CC are intrinsic and always run).

    *strict_verify* (J7, scanner.py:645-695): re-split every cluster by
    the raw sha256 so only byte-identical members share a final cluster
    — the ``--strict-verify`` flag.  Only meaningful in exact mode (in
    hybrid mode near-members are intentionally non-identical)."""
    if mode not in ("exact", "similar", "hybrid"):
        raise ValueError(
            f"invalid mode: {mode!r} — must be one of: exact, similar, hybrid"
        )
    metrics: dict = {"mode": mode, "config_hash": cfg.config_hash()}

    _trace = os.environ.get("SPARK_GRAFT_STAGE_TIMING") == "1"
    # Checkpoints are LAZY by default (eager=False): the block is still
    # materialized exactly once and reused by every downstream consumer,
    # but the materialization folds into the first consuming job instead
    # of a dedicated serial job+barrier per checkpoint.  At sf0.1 the
    # three eager barriers cost ~9 s of fixed serial time (VERDICT r3
    # "What's wrong #1"); at 468k files they are pure serial fraction
    # against the 8→32-core scaling gate.  Eager mode remains available
    # for per-stage wall attribution (the [stage-timing] marks only
    # measure real work when each stage materializes at its mark).
    _eager = os.environ.get("SPARK_GRAFT_EAGER_CHECKPOINTS") == "1" or _trace
    _t = [time.monotonic()]

    def _mark(stage: str) -> None:
        if _trace:
            now = time.monotonic()
            print(f"[stage-timing] {stage}: {now - _t[0]:.1f}s", file=sys.stderr, flush=True)
            _t[0] = now

    docs, ing_m = ingest(files, cfg, collect_metrics)
    metrics.update(ing_m)

    # Input-size probe drives three plan-shape decisions below: the
    # broadcast-reps hint, the pair-stage width cap, and the verify
    # tile count.  Probed once.
    in_bytes = _input_bytes(files)

    # Widen small/unsplittable scans (cfg.widen_small_scan_bytes): the
    # driver testdata is a SINGLE-row-group parquet file, so the scan
    # yields one real partition and the keys pass + signature pandas
    # UDF would run on one core out of 32 (measured: the signature
    # stage alone was 16-18 s at bench sf1.0; widened it is ~1.5 s).
    # The round-robin exchange moves ≤ the cap's content bytes — noise.
    # Large corpora skip this: their scans are already wide and the
    # exchange would move the full corpus content for nothing.
    shuffle_conf_n = int(spark.conf.get("spark.sql.shuffle.partitions"))
    if in_bytes is not None and in_bytes <= cfg.widen_small_scan_bytes:
        docs = docs.repartition(shuffle_conf_n)

    # --- stage 1: exact + normalized keys (pure built-ins, codegen'd),
    # plus the group representative: min (repo, path) member per
    # normalized key — the reference's group[0] after sort
    # (scanner.py:550, oracle.py:94).
    #
    # The rep is picked with groupBy().agg(min(struct(...))), NOT a
    # window: a hash aggregate partial-combines map-side, and the agg
    # runs over content-FREE rows (keyed_lite below) so only key/id
    # columns ever cross that shuffle; rep content is re-attached from
    # the raw scan afterwards, while a window min would shuffle EVERY
    # row's content.
    # H4 dispatch: with cfg.normalize_langs set, only those langs key on
    # normalized content — the rest key raw (compute_hash branch,
    # hasher.py:157-172); None keeps the all-normalized v1 behavior
    if cfg.normalize_langs is None:
        group_key = norm_key_col(F.col("content"))
    else:
        from photo_dedup_spark.functions.keys import dispatch_key_col

        group_key = dispatch_key_col(
            F.col("lang"), F.col("content"), cfg.normalize_langs
        )
    # keyed_lite: every identity/key column EXCEPT content, materialized
    # ONCE.  normalize+sha over full content is the single most expensive
    # JVM pass; leaving `keyed` lazy made every downstream consumer
    # (reps agg, member_base, final member projection) recompute it — measured as
    # the dominant cost of the final materialization.  The checkpoint is
    # ~100 B/row (no content); at true 10^12-row scale this is the
    # per-stage parquet checkpoint plans/checkpoint.py persists — here a
    # localCheckpoint serves the same single-computation role.
    # exact_key (a SECOND full sha2 pass over content) is consumed only
    # by the strict_verify re-split — computing it unconditionally cost
    # a full content hash pass per run (measured ~4 s of the keys stage
    # at the 468k-file corpus) that the default mode threw away
    keyed_lite = docs.select(
        "doc_id",
        "repo",
        "path",
        "lang",
        "n_chars",
        *(
            [exact_key_col(F.col("content")).alias("exact_key")]
            if strict_verify
            else []
        ),
        group_key.alias("norm_key"),
    ).localCheckpoint(eager=_eager)
    reps_lite = keyed_lite.groupBy("norm_key").agg(
        F.min(F.struct("repo", "path", "doc_id", "n_chars")).alias("m")
    ).select(
        "norm_key",
        F.col("m.doc_id").alias("doc_id"),
        F.col("m.repo").alias("repo"),
        F.col("m.path").alias("path"),
        F.col("m.n_chars").alias("n_chars"),
    )
    # re-attach content for representatives only: join the content-free
    # rep table back to the raw scan on doc_id.  The rep side is
    # statically hinted broadcast when the input scan is provably small
    # (cfg.broadcast_reps_max_input_bytes): relying on AQE here is not
    # enough — AQE converts to a broadcast join only after BOTH sides
    # have shuffled, so the full corpus content would cross an exchange
    # once, and that content shuffle runs concurrently with the keys
    # scan, inflating its CPU ~3x under memory-bandwidth contention
    # (measured 2-vs-8-core, BENCH/SCALING.md).  Past the cap — real
    # cluster corpora — the hint is withheld and this degrades to a
    # shuffle join on doc_id: still exactly one normalize pass.
    hint_broadcast = (
        in_bytes is not None and in_bytes <= cfg.broadcast_reps_max_input_bytes
    )
    reps_side = F.broadcast(reps_lite) if hint_broadcast else reps_lite
    reps = docs.select("doc_id", "content").join(reps_side, "doc_id")
    # member → representative mapping; pure checkpointed-column join
    rep_side = (
        F.broadcast(reps_lite.select("norm_key", F.col("doc_id").alias("rep_id")))
        if hint_broadcast
        else reps_lite.select("norm_key", F.col("doc_id").alias("rep_id"))
    )
    # member rows with their rep attached — the single source for both
    # the label table and the final member projection (stage 6), so the
    # old keyed_lite ⋈ labels self-join (two exchanges + sorts of the
    # full doc table for rows that both descend from keyed_lite) is
    # gone: one rep attach, reused
    member_base = keyed_lite.join(rep_side, "norm_key")
    _mark("keys")

    if mode in ("hybrid", "similar"):
        # --- stage 2: signatures on group representatives only.
        # Representative pattern (J6, scanner.py:549-567): one signature
        # per distinct normalized content; members inherit via rep_id.
        # Oversize reps keep exact keys only (degrade-don't-drop,
        # hasher.py:109-119).
        eligible = reps.where(F.col("n_chars") <= cfg.content_cap_chars)
        if collect_metrics:
            n_reps = reps.count()
            metrics["signature_reps"] = n_reps
            metrics["oversize_exact_only"] = n_reps - eligible.count()

        # signed carries ONLY what downstream stages read: band_hashes +
        # simhash chunks feed candidates, (sketch, sketch_b, simhash)
        # feed verify, (repo, path) feed the split's iteration order.
        # Content does not survive this stage — the pair join must never
        # move full text (SURVEY §4.2 select-pruning).
        sign_udf = make_signature_struct_udf(cfg)
        signed = (
            eligible.select(
                "doc_id",
                "repo",
                "path",
                normalize_col(F.col("content")).alias("norm_content"),
            )
            .withColumn("sig", sign_udf(F.col("norm_content")))
            .select(
                "doc_id",
                "repo",
                "path",
                F.col("sig.simhash").alias("simhash"),
                F.col("sig.band_hashes").alias("band_hashes"),
                F.col("sig.sketch").alias("sketch"),
                F.col("sig.sketch_b").alias("sketch_b"),
            )
        )
        signed = signed.localCheckpoint(eager=_eager)
        _mark("signatures")

        # --- stage 3: candidates (LSH bands ∪ SimHash prefixes)
        banded = lsh.explode_bands(signed, cfg).unionByName(
            lsh.explode_simhash_chunks(signed, cfg)
        )
        shuffle_n = shuffle_conf_n
        # The explicit numPartitions below is immune to AQE coalescing
        # (that is its purpose at bench scale: AQE's size-based rule
        # squeezed the Python-CPU-heavy stages into too few tasks).  The
        # flip side is that a TINY input pays full task-overhead waves —
        # at sf0.1 (1.5 MB) the pair stage runs ~10 exchanges × 128
        # tasks of ~40 rows.  Reuse the broadcast gate's input-size
        # probe to cap the pair-stage width for small scans: inputs
        # under cfg.narrow_pairs_max_input_bytes keep ≥ 32-way
        # parallelism (plenty at that size, measured −2 s warm at
        # sf0.1) while anything larger — every at-scale corpus — keeps
        # the exact current behavior.
        if in_bytes is not None and in_bytes < cfg.narrow_pairs_max_input_bytes:
            shuffle_n = min(shuffle_n, 32)
        # the tiled verifier (below) dedups pairs inside each tile, so
        # the pair table skips its distinct() shuffle entirely; the
        # classic fallback (unknown input size) needs it
        tile_blocks = None
        if in_bytes is not None:
            tile_blocks = min(
                cfg.verify_tile_max_blocks,
                max(
                    cfg.verify_tile_min_blocks,
                    in_bytes // cfg.verify_tile_block_bytes,
                ),
            )
        pairs, bucket_stats = lsh.candidate_pairs(
            banded, cfg, num_partitions=shuffle_n, distinct=tile_blocks is None
        )
        if collect_metrics:
            metrics["lsh_bucket_routes"] = {
                r["route"]: r["n"]
                for r in bucket_stats.groupBy("route")
                .agg(F.count("*").alias("n"))
                .collect()
            }
            metrics["candidate_pairs"] = (
                pairs.count() if tile_blocks is None else pairs.distinct().count()
            )

        # --- stage 4: verify (failures counted via accumulator — the
        # reference's count-and-drop progress telemetry, A5).
        # Block-tiled strategy (operators/verify.py): sketch bytes move
        # O(distinct(doc, tile)) instead of O(pairs) — at bench sf1.0
        # the classic per-pair join shuffled ~18 GB of sketches through
        # two exchanges (the flagship's dominant cost); tiles cut that
        # 13×.  nb scales with input size so per-tile payload stays
        # bounded; unknown-size inputs keep the classic join.
        fail_acc = spark.sparkContext.accumulator(0) if collect_metrics else None
        # NOTE: the tile stage gets the FULL shuffle width, not the
        # narrow-input cap — it is Python-CPU-heavy (per-pair sketch
        # merges), so more, smaller groups balance the task waves
        # (measured at sf1.0: 32-wide 19.5 s vs 128-wide 11.8 s)
        verified = verify_pairs(
            pairs,
            signed,
            cfg,
            failure_counter=fail_acc,
            tile_blocks=tile_blocks,
            num_partitions=shuffle_conf_n,
            dedup_pairs=tile_blocks is not None,
        )
        near_edges = verified.where(F.col("is_edge")).select("src", "dst")
        near_edges = near_edges.localCheckpoint(eager=_eager)
        _mark("candidates+verify")
        if collect_metrics:
            metrics["verified_edges"] = near_edges.count()
            metrics["verify_failures"] = fail_acc.value

        # --- stage 5: connected components over the REP graph only —
        # nodes are just the edge endpoints (reps with no verified edge
        # keep their own label via the coalesce below)
        nodes = (
            near_edges.select(F.col("src").alias("doc_id"))
            .unionByName(near_edges.select(F.col("dst").alias("doc_id")))
            .distinct()
        )
        comp_labels, cc_m = connected_components(nodes, near_edges, cfg)
        metrics.update(cc_m)
        _mark("components")

        # --- stage 5.5: representative-verify split within components
        # (scanner.py:382-395) — precision semantics; subsumes the
        # hybrid group-merge (J6): exact groups linked through reps by
        # a verified pair land in one subgroup
        # Driver-resolved CC graphs come with a free component census:
        # max_component lets the split skip its sizes join + oversized
        # probe job, and a provably small label table upgrades the
        # members join and the sub-label attach to broadcast joins (no
        # shuffle of the signature or doc tables).  Distributed-CC
        # graphs (above cc_driver_max_edges) keep the general plan.
        cc_small = (
            cc_m.get("cc_mode") == "driver-union-find"
            and cc_m.get("cc_driver_edges", 0) <= cfg.cc_driver_max_edges
        )
        splits = rep_verify_split(
            comp_labels,
            signed,
            cfg,
            metrics=metrics,
            num_partitions=shuffle_n,
            max_component=cc_m.get("cc_max_component") if cc_small else None,
            broadcast_labels=cc_small,
        )
        if collect_metrics:
            metrics["split_oversized_components"] = oversized_component_count(
                comp_labels, cfg
            )
        sub_side = splits.select(
            F.col("doc_id").alias("rep_id"),
            F.col("cluster_id").alias("sub_label"),
        )
        if cc_small:
            # splits rows ≤ CC nodes ≤ 2×cc_driver_edges — bounded small
            sub_side = F.broadcast(sub_side)
        labeled = member_base.join(sub_side, "rep_id", "left").withColumn(
            "cluster_id",
            F.coalesce(F.col("sub_label"), F.col("rep_id")),
        )
        _mark("split")
        edges = near_edges
    else:
        # exact mode: clusters ARE the normalized-key groups — the
        # rep mapping is already the cluster label (no CC, no joins)
        labeled = member_base.withColumn("cluster_id", F.col("rep_id"))
        edges = None

    # --- stage 5.75: strict re-split (J7) — composite (cluster, raw sha)
    # key, then re-canonicalize to min doc_id per subgroup so the label
    # domain stays LongType (member_base already carries exact_key)
    if strict_verify:
        labeled = labeled.withColumn(
            "cluster_id",
            F.min("doc_id").over(Window.partitionBy("cluster_id", "exact_key")),
        )

    labels = labeled.select("doc_id", "cluster_id")

    # --- stage 6: keep-selection over members (a projection of the
    # labeled member rows — no re-join against the doc table)
    members = labeled.select(
        "doc_id", "repo", "path", "lang", "n_chars", "cluster_id"
    )
    selected = keep_selection(members)
    if collect_metrics:
        metrics["clusters"] = labels.select("cluster_id").distinct().count()

    return PipelineResult(assignments=selected, edges=edges, metrics=metrics)
