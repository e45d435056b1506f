"""Action-plan generation — the clean/undo phase as pure DataFrames.

The reference mutates a filesystem (cleaner.py Phase A/B/C); we compute
*what to do* as an ordered, reversible plan (SURVEY.md §2.11).  The
decision logic reproduced:

  C1 Phase A moves: delete-members move to a structure-preserving
     backup subtree; name collisions inside the backup dir get a
     ``_dupN`` suffix (cleaner.py:722-795, suffixing 756-764).
  C2 Phase B renames: keep-files whose group has a better name are
     renamed; conflicts with paths outside the rename set are skipped
     (cleaner.py:823-837); chained renames (A→B while B→C) are made
     safe by two-phase temp hops (cleaner.py:797-919).
  C4 undo: the inverse plan replays events in reverse sequence order
     (cleaner.py:1196-1248).

Every plan row carries a monotonically increasing ``seq`` so the event
order (and its reverse) is total and deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from photo_dedup_spark.functions.naming import is_meaningless, readability_score

BACKUP_DIR = "_duplicates_backup"  # utils.py:7 / cleaner.py default


def move_plan(selected: DataFrame) -> DataFrame:
    """C1: one ``move`` row per delete-member.

    dst = BACKUP_DIR/<original path>, with a value-based ``_dupN``
    suffix when several sources collapse onto one backup basename
    (rank within (dst) ordered by src — deterministic, partition-free).
    """
    deletes = selected.where(~F.col("is_keep")).select(
        F.col("cluster_id"), F.col("path").alias("src"), F.col("n_chars")
    )
    base_dst = F.concat(F.lit(BACKUP_DIR + "/"), F.col("src"))
    planned = deletes.withColumn("base_dst", base_dst)
    w = Window.partitionBy("base_dst").orderBy("src", "cluster_id")
    return (
        planned.withColumn("collide_rn", F.row_number().over(w))
        .withColumn(
            "dst",
            F.when(F.col("collide_rn") == 1, F.col("base_dst")).otherwise(
                F.concat_ws(
                    "_dup",
                    F.col("base_dst"),
                    (F.col("collide_rn") - 1).cast("string"),
                )
            ),
        )
        .select(
            F.lit("move").alias("action"),
            "cluster_id",
            "src",
            "dst",
        )
    )


def rename_plan(selected: DataFrame) -> DataFrame:
    """C2 + F3: rename each keep-file to the group's best member name.

    Best name = argmax readability score over member basenames, ties by
    name desc (the reference's ``max`` tie semantics, naming.py:164-167);
    the keep-file's extension is ALWAYS preserved (naming.py:173-174).
    Renames where best == current are dropped.

    Conflict handling, mirroring cleaner.py:797-919 at plan level:

      * target equals a surviving path that is NOT itself being renamed
        away → ``skip`` (cleaner.py:823-837);
      * two proposals share a target → first by (src) order wins, the
        rest ``skip`` (Phase-2 "target still exists" rollback);
      * CHAINED renames (this rename's dst == another rename's src,
        e.g. A→B while B→C) are made execution-safe with two-phase
        temp hops (cleaner.py:797-919 stages ALL renames through
        ``_make_temp_rename_path``; we stage exactly the chain-implicated
        ones): ``rename_stage`` (A→tmp) rows run before every plain
        ``rename``, and ``rename_final`` (tmp→B) rows run after — see
        :func:`sequence_plan` phase order.  Temp names are value-based
        (sha256 of the src), so the plan stays deterministic where the
        reference uses uuid4 (cleaner.py:495-509).
    """
    members = selected.select(
        "cluster_id", "path", "is_keep", readability_score(F.col("path")).alias("score")
    )
    stem = F.regexp_replace(
        F.regexp_replace(F.element_at(F.split("path", "/"), -1), r"\.[A-Za-z0-9]+$", ""),
        r" \([0-9]+\)$",
        "",
    )
    scored = members.withColumn("stem", stem)
    w = Window.partitionBy("cluster_id").orderBy(F.desc("score"), F.desc("stem"))
    best = (
        scored.withColumn("brn", F.row_number().over(w))
        .where(F.col("brn") == 1)
        .select("cluster_id", F.col("stem").alias("best_stem"))
    )
    keeps = selected.where(F.col("is_keep")).select("cluster_id", "path")
    keep_dir = F.when(
        F.instr(F.col("path"), "/") > 0,
        F.expr("substring(path, 1, length(path) - length(element_at(split(path, '/'), -1)))"),
    ).otherwise(F.lit(""))
    keep_ext = F.regexp_extract(F.element_at(F.split("path", "/"), -1), r"(\.[A-Za-z0-9]+)$", 1)
    proposals = (
        keeps.join(best, "cluster_id")
        .withColumn("dst", F.concat(keep_dir, F.col("best_stem"), keep_ext))
        .where(F.col("dst") != F.col("path"))
        .select(
            F.lit("rename").alias("action"),
            "cluster_id",
            F.col("path").alias("src"),
            "dst",
        )
    )
    # conflict rule 1: target collides with a surviving path that is not
    # itself being renamed away → skip (cleaner.py:823-837)
    survivors = selected.where(F.col("is_keep")).select(F.col("path").alias("dst"))
    moving_away = proposals.select(F.col("src").alias("dst"))
    blocked = survivors.exceptAll(moving_away)
    ok = proposals.join(blocked, "dst", "left_anti")
    skipped_ext = proposals.join(blocked, "dst", "left_semi").withColumn(
        "action", F.lit("skip")
    )
    # conflict rule 2: duplicate targets among surviving proposals —
    # first by src order wins, later ones skip
    w_dst = Window.partitionBy("dst").orderBy("src", "cluster_id")
    ranked = ok.withColumn("dst_rn", F.row_number().over(w_dst))
    ok = ranked.where(F.col("dst_rn") == 1).drop("dst_rn")
    skipped_dup = (
        ranked.where(F.col("dst_rn") > 1)
        .drop("dst_rn")
        .withColumn("action", F.lit("skip"))
    )
    # chain detection: dst == another surviving rename's src ⇒ two-phase
    srcs = ok.select(F.col("src").alias("dst"))
    chained = ok.join(srcs, "dst", "left_semi")
    plain = ok.join(srcs, "dst", "left_anti")
    # temp hop stays in the SOURCE directory and keeps the basename,
    # mirroring _make_temp_rename_path (cleaner.py:495-509:
    # dirname + '.__photo_dedup_tmp_<uuid>_<basename>') — a root-level
    # temp would hop files across directories mid-plan
    src_base = F.element_at(F.split("src", "/"), -1)
    src_dir = F.when(
        F.instr(F.col("src"), "/") > 0,
        F.expr(
            "substring(src, 1, length(src) - length(element_at(split(src, '/'), -1)))"
        ),
    ).otherwise(F.lit(""))
    tmp = F.concat(
        src_dir,
        F.lit(".__dedup_tmp_"),
        F.sha2(F.col("src"), 256).substr(1, 16),
        F.lit("_"),
        src_base,
    )
    stage_rows = chained.select(
        F.lit("rename_stage").alias("action"),
        "cluster_id",
        "src",
        tmp.alias("dst"),
    )
    final_rows = chained.select(
        F.lit("rename_final").alias("action"),
        "cluster_id",
        tmp.alias("src"),
        "dst",
    )
    return (
        plain.unionByName(stage_rows)
        .unionByName(final_rows)
        .unionByName(skipped_ext)
        .unionByName(skipped_dup)
    )


MTIME_TOLERANCE_SECONDS = 1.0  # cleaner.py:55


def date_rename_plan(
    selected: DataFrame,
    ts_col: str = "commit_ts",
    scope: str = "kept-only",  # 'kept-only' (default) | 'all-files' (cleaner.py:56-57)
) -> DataFrame:
    """C3 (cleaner.py:921-1098): files with meaningless names are renamed
    to a date filename derived from the group-earliest timestamp (A3
    ``get_earliest_date`` → min over the cluster, metadata.py:124-140),
    with ``_1``, ``_2``… conflict suffixes as a rank within the target
    (dir, date-stem) — W3, metadata.py:143-177.  Files whose timestamp
    drifts > MTIME_TOLERANCE_SECONDS from the group minimum also get a
    ``set_mtime`` row (cleaner.py:1061-1082).

    *selected* needs (cluster_id, path, is_keep, <ts_col> timestamp).
    """
    if scope not in ("kept-only", "all-files"):
        # cleaner.py:579-586 rejects unknown scopes up front
        raise ValueError(f"invalid scope: {scope!r} (kept-only | all-files)")
    earliest = selected.groupBy("cluster_id").agg(F.min(ts_col).alias("earliest_ts"))
    # Phase C never touches moved-away delete-members (they live in the
    # backup tree, excluded by the fast root checker cleaner.py:967-981)
    # — only SURVIVING rows are candidates.  kept-only additionally
    # restricts to keep-files of real dup groups; all-files also covers
    # singletons (the "unrelated files" of the reference's walk).
    survivors = selected.where(F.col("is_keep"))
    if scope == "kept-only":
        counts = F.count("*").over(Window.partitionBy("cluster_id"))
        survivors = (
            selected.withColumn("_mc", counts)
            .where(F.col("is_keep") & (F.col("_mc") >= 2))
            .drop("_mc")
        )
    t = survivors.join(earliest, "cluster_id")

    base = F.element_at(F.split("path", "/"), -1)
    ext = F.regexp_extract(base, r"(\.[A-Za-z0-9]+)$", 1)
    dirp = F.when(
        F.instr(F.col("path"), "/") > 0,
        F.expr("substring(path, 1, length(path) - length(element_at(split(path, '/'), -1)))"),
    ).otherwise(F.lit(""))
    date_stem = F.date_format(F.col("earliest_ts"), "yyyyMMdd")

    needs = t.where(is_meaningless(F.col("path"))).select(
        "cluster_id",
        "path",
        F.col("earliest_ts"),
        dirp.alias("dirp"),
        date_stem.alias("date_stem"),
        ext.alias("ext"),
    )
    w = Window.partitionBy("dirp", "date_stem").orderBy("path")
    rn = F.row_number().over(w)
    renames = needs.select(
        F.lit("date_rename").alias("action"),
        "cluster_id",
        F.col("path").alias("src"),
        F.concat(
            F.col("dirp"),
            F.col("date_stem"),
            F.when(rn == 1, F.lit("")).otherwise(
                F.concat(F.lit("_"), (rn - 1).cast("string"))
            ),
            F.col("ext"),
        ).alias("dst"),
    )
    mtimes = (
        t.where(
            F.abs(
                F.col(ts_col).cast("double") - F.col("earliest_ts").cast("double")
            )
            > MTIME_TOLERANCE_SECONDS
        )
        .select(
            F.lit("set_mtime").alias("action"),
            "cluster_id",
            F.col("path").alias("src"),
            F.date_format("earliest_ts", "yyyy-MM-dd'T'HH:mm:ss'Z'").alias("dst"),
        )
    )
    # a file date-renamed in phase 4 no longer exists at its old path
    # when the phase-5 mtime row replays (cleaner.py:1048-1063 touches
    # the POST-rename path) — substitute the date_rename dst
    dr_map = renames.select(
        F.col("src").alias("_old"), F.col("dst").alias("_new")
    )
    mtimes = (
        mtimes.join(dr_map, mtimes.src == dr_map._old, "left")
        .withColumn("src", F.coalesce(F.col("_new"), F.col("src")))
        .drop("_old", "_new")
        .select("action", "cluster_id", "src", "dst")
    )
    return renames.unionByName(mtimes)


# total phase order (cleaner.py:718-1098): Phase A moves, then Phase B
# renames — stage hops BEFORE plain renames BEFORE final hops, so
# executing the plan in ascending ``seq`` never clobbers a chain
# member — then Phase C, with no-op skips last.
def _phase_col():
    return (
        F.when(F.col("action") == "move", 0)
        .when(F.col("action") == "rename_stage", 1)
        .when(F.col("action") == "rename", 2)
        .when(F.col("action") == "rename_final", 3)
        .when(F.col("action") == "date_rename", 4)
        .when(F.col("action") == "set_mtime", 5)
        .otherwise(9)  # skip
    )

_SEQ_BUCKETS = 64


def sequence_plan(plan: DataFrame) -> DataFrame:
    """Assign the total event order, value-based and DISTRIBUTED.

    A single ``Window.orderBy`` funnels the whole plan through one task
    — a scale-killer.  Instead: two-level ranking.  Rows hash into
    ``_SEQ_BUCKETS`` buckets; ``row_number`` runs per (phase, bucket)
    partition; bucket offsets come from a cumulative sum over the tiny
    (phases × buckets) count table (broadcast back).  The resulting
    order is (phase, bucket, src, dst) — total, deterministic, and
    computed with no single-partition exchange.
    """
    p = plan.withColumn("_phase", _phase_col()).withColumn(
        "_bucket", F.pmod(F.xxhash64("src", "dst"), F.lit(_SEQ_BUCKETS)).cast("int")
    )
    w_in = Window.partitionBy("_phase", "_bucket").orderBy("src", "dst")
    ranked = p.withColumn("_rn", F.row_number().over(w_in))
    # counts table is ≤ #phases × _SEQ_BUCKETS rows BY CONSTRUCTION (a
    # constant, independent of plan size) — the cumulative offsets are
    # computed driver-side and rejoined as a broadcast literal table,
    # so NO single-partition exchange touches the plan itself
    counts = sorted(
        (
            (r["_phase"], r["_bucket"], r["_n"])
            for r in p.groupBy("_phase", "_bucket")
            .agg(F.count("*").alias("_n"))
            .collect()
        )
    )
    offsets, running = [], 0
    for ph, bk, n in counts:
        offsets.append((ph, bk, running))
        running += n
    spark = plan.sparkSession
    off_df = spark.createDataFrame(
        offsets, "_phase int, _bucket int, _offset long"
    )
    return (
        ranked.join(F.broadcast(off_df), ["_phase", "_bucket"])
        .withColumn("seq", F.col("_offset") + F.col("_rn"))
        .drop("_phase", "_bucket", "_rn", "_offset")
    )


def undo_plan(plan: DataFrame) -> DataFrame:
    """C4: inverse plan — reverse order, src/dst swapped; ``skip`` rows
    drop out (they did nothing).  ``max(seq)`` rides along as a
    broadcast scalar — no eager driver-side count mid-plan."""
    doable = plan.where(F.col("action") != "skip")
    mx = doable.agg(F.max("seq").alias("_mx"))
    return doable.crossJoin(F.broadcast(mx)).select(
        F.concat(F.lit("undo_"), F.col("action")).alias("action"),
        "cluster_id",
        F.col("dst").alias("src"),
        F.col("src").alias("dst"),
        (F.col("_mx") + 1 - F.col("seq")).alias("seq"),
    )
