"""Clean / undo entry points — the reference's second and third CLI
flows as batch plan jobs (SURVEY.md §3.2-3.3, mirroring
/root/reference/photo_dedup/cleaner.py:538-1259 decision-for-decision;
we compute and log WHAT to do, we never touch a filesystem).

``clean``: load + hard-validate the report (schema, source match,
path safety, cross-group uniqueness — cleaner.py:589-602), build the
phase plans (A moves, B chain-safe renames, C date renames + mtime),
sequence them totally, refuse to run over an in-progress log
(cleaner.py:694-705), and write the event log through the status state
machine (in_progress → moves_complete → complete).  ``dry_run``
computes the FULL plan but writes nothing — zero side effects
(cleaner.py:674-676, pinned by reference test
test_clean_dry_run_no_side_effects).

``undo``: strict-load the event log (type + count + path-safety
validation, S8) and emit the inverse plan in reverse sequence order;
status → undone (cleaner.py:1126-1259).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from photo_dedup_spark.operators.groups import dup_groups_only
from photo_dedup_spark.operators.plan import (
    date_rename_plan,
    move_plan,
    rename_plan,
    sequence_plan,
    undo_plan,
)
from photo_dedup_spark.sources import eventlog
from photo_dedup_spark.sources.report import (
    load_report,
    validate_relative_paths,
    validate_report_paths,
    validate_source_match,
)


@dataclass
class CleanResult:
    plan: DataFrame
    summary: dict
    log_meta: dict | None  # None on dry runs (nothing written)


def _selected_from_groups(groups: DataFrame) -> DataFrame:
    """Report groups back to the flat (cluster_id, path, n_chars,
    is_keep) member table the plan builders consume."""
    keeps = groups.select(
        "cluster_id",
        F.col("keep.path").alias("path"),
        F.col("keep.size").alias("n_chars"),
        F.lit(True).alias("is_keep"),
    )
    deletes = groups.select(
        "cluster_id", F.explode("delete").alias("d")
    ).select(
        "cluster_id",
        F.col("d.path").alias("path"),
        F.col("d.size").alias("n_chars"),
        F.lit(False).alias("is_keep"),
    )
    return keeps.unionByName(deletes)


def _net_renames(plan: DataFrame) -> DataFrame:
    """Net (rsrc → rdst) effect of Phase B: plain renames directly,
    chained renames by composing their stage (src → tmp) and final
    (tmp → dst) hops."""
    renames = plan.where(F.col("action") == "rename").select(
        F.col("src").alias("rsrc"), F.col("dst").alias("rdst")
    )
    stage = plan.where(F.col("action") == "rename_stage").select(
        F.col("src").alias("rsrc"), F.col("dst").alias("tmp")
    )
    final = plan.where(F.col("action") == "rename_final").select(
        F.col("src").alias("tmp"), F.col("dst").alias("rdst")
    )
    return renames.unionByName(stage.join(final, "tmp").select("rsrc", "rdst"))


def clean(
    spark: SparkSession,
    report_dir: str,
    log_dir: str,
    source: str | None = None,
    dry_run: bool = False,
    force: bool = False,
    date_scope: str | None = None,  # None = no Phase C; 'kept-only' | 'all-files'
    timestamps: DataFrame | None = None,  # (path, commit_ts) for Phase C
    ts_col: str = "commit_ts",
) -> CleanResult:
    """Validate → plan → (unless dry_run) log.  Raises
    InvalidReportError / EventLogError on any integrity violation
    BEFORE anything is written (fail-fast ordering mirrors
    cleaner.py:589-705)."""
    doc, groups = load_report(spark, report_dir)
    if source is not None:
        validate_source_match(doc, source, force=force)
    validate_relative_paths(groups)
    validate_report_paths(groups)

    selected = _selected_from_groups(groups)
    dups = dup_groups_only(selected)
    plan = move_plan(dups).unionByName(rename_plan(dups))
    null_ts_excluded = None
    if date_scope is not None:
        if timestamps is None:
            raise ValueError(
                f"date_scope={date_scope!r} needs a (path, {ts_col}) timestamps frame"
            )
        # LEFT join: a file missing from the timestamps frame must not
        # vanish silently (the reference falls back per-file to
        # filesystem dates with a logged warning, metadata.py:96-121;
        # we have no filesystem, so null-ts rows are EXCLUDED from
        # Phase C — and from the cluster-earliest min — with a counted
        # summary entry, never an invisible inner-join drop)
        with_ts = selected.join(timestamps.select("path", ts_col), "path", "left")
        tsc = with_ts.agg(
            F.count("*").alias("n"), F.count(ts_col).alias("nts")
        ).collect()[0]
        null_ts_excluded = int(tsc["n"] - tsc["nts"])
        with_ts = with_ts.where(F.col(ts_col).isNotNull())
        # Phase C sees the POST-Phase-B tree (cleaner.py:893-905 re-keys
        # earliest_dates after each rename; 1048-1063 touches post-rename
        # paths): substitute net rename dsts for paths BEFORE evaluating
        # is_meaningless or emitting srcs — a keep renamed in Phase B to
        # a meaningful name gets no date_rename at all
        net = _net_renames(plan)
        post = (
            with_ts.join(net, with_ts.path == net.rsrc, "left")
            .withColumn("path", F.coalesce(F.col("rdst"), F.col("path")))
            .drop("rsrc", "rdst")
        )
        plan = plan.unionByName(date_rename_plan(post, ts_col, date_scope))
    plan = sequence_plan(plan)

    counts = {
        r["action"]: r["n"]
        for r in plan.groupBy("action").agg(F.count("*").alias("n")).collect()
    }
    summary = {"actions": counts, "dry_run": dry_run}
    if null_ts_excluded is not None:
        summary["null_ts_excluded"] = null_ts_excluded

    if dry_run:
        # zero side effects: no log dir, no meta, no events
        return CleanResult(plan=plan, summary=summary, log_meta=None)

    eventlog.guard_not_in_progress(log_dir)
    meta = eventlog.write_events(plan, log_dir, status="in_progress")
    # the plan is fully materialized once written; phases A/B complete
    # by construction of the total seq order, so the state machine can
    # advance (an executor failing mid-phase would resume from the log)
    eventlog.set_status(log_dir, "moves_complete")
    eventlog.set_status(log_dir, "complete")
    meta["status"] = "complete"
    return CleanResult(plan=plan, summary=summary, log_meta=meta)


def undo(spark: SparkSession, log_dir: str) -> DataFrame:
    """Inverse plan from the validated event log, reverse seq order;
    advances the log to ``undone`` (cleaner.py:1126-1259)."""
    meta, events = eventlog.load_events(spark, log_dir)
    if meta["status"] == "undone":
        raise eventlog.EventLogError("log already undone")
    inverse = undo_plan(events)
    eventlog.set_status(log_dir, "undone")
    return inverse
