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
    if date_scope is not None:
        if timestamps is None:
            raise ValueError(
                f"date_scope={date_scope!r} needs a (path, {ts_col}) timestamps frame"
            )
        with_ts = selected.join(timestamps.select("path", ts_col), "path")
        plan = plan.unionByName(date_rename_plan(with_ts, ts_col, date_scope))
    plan = sequence_plan(plan)

    counts = {
        r["action"]: r["n"]
        for r in plan.groupBy("action").agg(F.count("*").alias("n")).collect()
    }
    summary = {"actions": counts, "dry_run": dry_run}

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
