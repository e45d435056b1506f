"""Action-plan + report semantics (reference clean-phase, TestEndToEnd
/ TestPhaseC analogs from /root/reference/tests/test_core.py:341-1386,
handcrafted-fixture style per FIXTURES.md §3)."""

import pytest
from pyspark.sql import functions as F

from photo_dedup_spark.operators.groups import (
    build_report_groups,
    dup_groups_only,
    keep_selection,
    summary_aggregates,
)
from photo_dedup_spark.operators.plan import (
    BACKUP_DIR,
    move_plan,
    rename_plan,
    sequence_plan,
    undo_plan,
)
from photo_dedup_spark.sources.report import (
    InvalidReportError,
    load_report,
    validate_report_paths,
    write_report,
)

MEMBER_SCHEMA = "doc_id long, cluster_id long, path string, n_chars long"


@pytest.fixture()
def selected(spark):
    rows = [
        # cluster 1: keep big.py, delete copy (same basename → collision)
        (1, 1, "a/big.py", 100),
        (2, 1, "b/big.py", 90),
        (3, 1, "c/big.py", 90),
        # cluster 2: tie on size → lexicographic path keeps "a/x (1).py"?
        # no: copy-suffix name scores lower but W1 only orders by path
        (4, 2, "d/zzz.py", 50),
        (5, 2, "d/aaa (1).py", 50),
        # singleton cluster (filtered out of dup reports)
        (6, 3, "lonely.py", 10),
    ]
    df = spark.createDataFrame(rows, MEMBER_SCHEMA)
    return keep_selection(df)


class TestKeepSelection:
    def test_keep_is_largest_then_path(self, selected):
        keeps = {
            r.cluster_id: r.path
            for r in selected.where(F.col("is_keep")).collect()
        }
        assert keeps[1] == "a/big.py"
        assert keeps[2] == "d/aaa (1).py"  # tie → path asc (scanner.py:714)

    def test_dup_filter_removes_singletons(self, selected):
        dups = dup_groups_only(selected)
        assert dups.where(F.col("cluster_id") == 3).count() == 0

    def test_summary(self, selected):
        s = summary_aggregates(selected, total_files=6).collect()[0]
        assert s.duplicate_groups == 2
        assert s.duplicate_files == 3  # 2 in c1 + 1 in c2
        assert s.space_saveable == 90 + 90 + 50
        assert s.files_remaining == 3


class TestMovePlan:
    def test_structure_preserving_and_collision_suffix(self, selected):
        dups = dup_groups_only(selected)
        mp = {r.src: r.dst for r in move_plan(dups).collect()}
        assert mp["b/big.py"] == f"{BACKUP_DIR}/b/big.py"
        assert mp["c/big.py"] == f"{BACKUP_DIR}/c/big.py"
        assert mp["d/zzz.py"] == f"{BACKUP_DIR}/d/zzz.py"

    def test_collision_gets_dupN(self, spark):
        # two different clusters deleting the same relative path
        rows = [
            (1, 1, "x/f.py", 10),
            (2, 1, "same/f.py", 5),
            (3, 2, "y/f.py", 10),
            (4, 2, "same/f.py2", 5),  # distinct path, no collision
        ]
        # force a collision by duplicating dst: two rows with path 'same/f.py'
        rows = [
            (1, 1, "keep1.py", 10),
            (2, 1, "same/f.py", 5),
            (3, 2, "keep2.py", 10),
            (4, 2, "same/f.py", 5),
        ]
        df = keep_selection(spark.createDataFrame(rows, MEMBER_SCHEMA))
        dups = dup_groups_only(df)
        dsts = sorted(r.dst for r in move_plan(dups).collect())
        assert dsts == [
            f"{BACKUP_DIR}/same/f.py",
            f"{BACKUP_DIR}/same/f.py_dup1",
        ]


class TestRenamePlan:
    def test_keep_renamed_to_best_member_name(self, spark):
        # delete-member has the better (date-prefixed) name; keep gets it,
        # but keeps its own extension (naming.py:173-174)
        rows = [
            (1, 1, "photos/885213.py", 100),
            (2, 1, "photos/2021-05-01_trip.txt", 90),
        ]
        df = keep_selection(spark.createDataFrame(rows, MEMBER_SCHEMA))
        plan = rename_plan(dup_groups_only(df)).collect()
        assert len(plan) == 1
        assert plan[0].action == "rename"
        assert plan[0].src == "photos/885213.py"
        assert plan[0].dst == "photos/2021-05-01_trip.py"  # ext preserved

    def test_no_rename_when_keep_has_best_name(self, spark):
        rows = [
            (1, 1, "a/2020-01-02_event.py", 100),
            (2, 1, "a/123.py", 90),
        ]
        df = keep_selection(spark.createDataFrame(rows, MEMBER_SCHEMA))
        assert rename_plan(dup_groups_only(df)).count() == 0

    def test_conflict_with_survivor_is_skipped(self, spark):
        # keep of c1 wants a name already held by keep of c2 (a survivor
        # not being renamed) → plan row action='skip' (cleaner.py:823-837)
        rows = [
            (1, 1, "d/999.py", 100),
            (2, 1, "d/2020-01-02_x.txt", 90),
            (3, 2, "d/2020-01-02_x.py", 100),  # survivor holding target
            (4, 2, "d/888.py", 90),
        ]
        df = keep_selection(spark.createDataFrame(rows, MEMBER_SCHEMA))
        plan = rename_plan(dup_groups_only(df))
        skips = plan.where(F.col("action") == "skip").collect()
        assert len(skips) == 1
        assert skips[0].src == "d/999.py"
        assert skips[0].dst == "d/2020-01-02_x.py"


def _execute(plan_rows, files: set[str]) -> set[str]:
    """In-memory plan executor: applies rows in ascending seq order and
    asserts no rename ever clobbers an existing path — the semantics the
    reference guarantees with two-phase temp hops (cleaner.py:797-919,
    pinned by test_core.py:555-642 chained renames)."""
    files = set(files)
    for r in sorted(plan_rows, key=lambda r: r.seq):
        if r.action == "skip":
            continue
        assert r.src in files, f"{r.action} src missing: {r.src}"
        assert r.dst not in files, f"{r.action} clobbers {r.dst}"
        files.remove(r.src)
        files.add(r.dst)
    return files


class TestChainedRenames:
    """Transplant of reference test_core.py:555-642: A→B while B→C while
    C→D must all succeed when the plan executes in seq order."""

    @pytest.fixture()
    def chain_selected(self, spark):
        rows = [
            # c1: keep d/111.py, best member stem 2020-01-01_a
            (1, 1, "d/111.py", 100),
            (2, 1, "x/2020-01-01_a.txt", 90),
            # c2: keep d/2020-01-01_a.py (the TARGET of c1's rename),
            # renames to 2020-01-02_b (tie → stem desc)
            (3, 2, "d/2020-01-01_a.py", 100),
            (4, 2, "x/2020-01-02_b.txt", 90),
            # c3: keep d/2020-01-02_b.py renames to 2020-01-03_c
            (5, 3, "d/2020-01-02_b.py", 100),
            (6, 3, "x/2020-01-03_c.txt", 90),
        ]
        return keep_selection(spark.createDataFrame(rows, MEMBER_SCHEMA))

    def test_chain_emits_two_phase_rows(self, chain_selected):
        plan = rename_plan(dup_groups_only(chain_selected)).collect()
        by_action = {}
        for r in plan:
            by_action.setdefault(r.action, []).append(r)
        # two chain-implicated renames staged, one plain tail rename
        assert len(by_action.get("rename_stage", [])) == 2
        assert len(by_action.get("rename_final", [])) == 2
        assert len(by_action.get("rename", [])) == 1
        # stage dst is a deterministic temp, final src matches it
        stage_dsts = {r.dst for r in by_action["rename_stage"]}
        final_srcs = {r.src for r in by_action["rename_final"]}
        assert stage_dsts == final_srcs
        # temp hops stay WITHIN the source directory (ADVICE r2: the
        # reference's _make_temp_rename_path, cleaner.py:495-509)
        assert all(
            d.rsplit("/", 1)[-1].startswith(".__dedup_tmp_") for d in stage_dsts
        )
        assert all(d.startswith("d/") for d in stage_dsts)

    def test_chain_executes_without_clobber(self, chain_selected):
        dups = dup_groups_only(chain_selected)
        plan = sequence_plan(move_plan(dups).unionByName(rename_plan(dups)))
        files = {r.path for r in chain_selected.collect()}
        final = _execute(plan.collect(), files)
        # every rename landed: all three targets exist, no temps remain
        assert {"d/2020-01-01_a.py", "d/2020-01-02_b.py", "d/2020-01-03_c.py"} <= final
        assert not any(p.startswith(".__dedup_tmp_") for p in final)

    def test_undo_restores_initial_state(self, chain_selected):
        dups = dup_groups_only(chain_selected)
        plan = sequence_plan(move_plan(dups).unionByName(rename_plan(dups)))
        files = {r.path for r in chain_selected.collect()}
        after = _execute(plan.collect(), files)
        restored = _execute(undo_plan(plan).collect(), after)
        assert restored == files

    def test_duplicate_targets_keep_first_skip_rest(self, spark):
        # two clusters whose keeps resolve to the SAME best name: first
        # by src order wins, the other becomes a skip row (Phase-2
        # "target still exists" semantics, cleaner.py:855-880)
        rows = [
            (1, 1, "d/111.py", 100),
            (2, 1, "x/2021-06-01_pic.txt", 90),
            (3, 2, "d/222.py", 100),
            (4, 2, "y/2021-06-01_pic.txt", 90),
        ]
        sel = keep_selection(spark.createDataFrame(rows, MEMBER_SCHEMA))
        plan = rename_plan(dup_groups_only(sel)).collect()
        renames = [r for r in plan if r.action == "rename"]
        skips = [r for r in plan if r.action == "skip"]
        assert len(renames) == 1 and renames[0].src == "d/111.py"
        assert len(skips) == 1 and skips[0].src == "d/222.py"


class TestSequencePlanShape:
    def test_no_single_partition_global_window(self, spark, selected):
        # the two-level rank must not funnel the plan through ONE task:
        # no Exchange SinglePartition feeding a Window/Sort in the plan
        dups = dup_groups_only(selected)
        plan = sequence_plan(move_plan(dups).unionByName(rename_plan(dups)))
        physical = plan._jdf.queryExecution().executedPlan().toString()
        assert "Exchange SinglePartition" not in physical, physical

    def test_seq_is_total_and_phase_ordered(self, selected):
        dups = dup_groups_only(selected)
        plan = sequence_plan(move_plan(dups).unionByName(rename_plan(dups))).collect()
        seqs = sorted(r.seq for r in plan)
        assert seqs == list(range(1, len(plan) + 1))
        phase_of = {"move": 0, "rename_stage": 1, "rename": 2, "rename_final": 3,
                    "date_rename": 4, "set_mtime": 5, "skip": 9}
        ordered = sorted(plan, key=lambda r: r.seq)
        phases = [phase_of[r.action] for r in ordered]
        assert phases == sorted(phases)


class TestUndo:
    def test_inverse_plan_reverses_order_and_swaps(self, selected):
        dups = dup_groups_only(selected)
        plan = sequence_plan(move_plan(dups).unionByName(rename_plan(dups)))
        inv = undo_plan(plan)
        fwd = {r.seq: (r.src, r.dst) for r in plan.collect()}
        rev = {r.seq: (r.src, r.dst) for r in inv.collect()}
        n = len(fwd)
        assert len(rev) == n
        for seq, (src, dst) in fwd.items():
            assert rev[n + 1 - seq] == (dst, src)


class TestReportRoundtrip:
    def test_write_validate_load(self, spark, selected, cfg, tmp_path):
        dups = dup_groups_only(selected)
        groups = build_report_groups(dups)
        summary = summary_aggregates(selected, total_files=6)
        out = str(tmp_path / "report")
        doc = write_report(groups, summary, out, cfg, source="unit-test")
        assert doc["summary"]["duplicate_groups"] == 2
        assert doc["config_hash"] == cfg.config_hash()
        loaded_doc, loaded_groups = load_report(spark, out)
        assert loaded_doc["version"] == doc["version"]
        assert loaded_groups.count() == 2
        validate_report_paths(loaded_groups)  # no duplicates → ok

    def test_duplicate_path_rejected(self, spark):
        # same path as keep in one group and delete in another
        # (cleaner.py:177-232 / test_core.py:386-416)
        import pyspark.sql.types as T
        from photo_dedup_spark.sources.report import GROUP_SCHEMA

        data = [
            (1, 2, {"path": "x.py", "size": 10}, [{"path": "y.py", "size": 5}]),
            (2, 2, {"path": "z.py", "size": 10}, [{"path": "x.py", "size": 5}]),
        ]
        groups = spark.createDataFrame(data, GROUP_SCHEMA)
        with pytest.raises(InvalidReportError):
            validate_report_paths(groups)

    def test_keep_equals_delete_rejected(self, spark):
        from photo_dedup_spark.sources.report import GROUP_SCHEMA

        data = [
            (1, 2, {"path": "x.py", "size": 10}, [{"path": "x.py", "size": 10}]),
        ]
        groups = spark.createDataFrame(data, GROUP_SCHEMA)
        with pytest.raises(InvalidReportError):
            validate_report_paths(groups)

    def test_missing_head_keys_rejected(self, spark, tmp_path):
        import json, os

        out = str(tmp_path / "bad")
        os.makedirs(out)
        with open(os.path.join(out, "duplicates_data.json"), "w") as f:
            json.dump({"version": 2}, f)
        with pytest.raises(InvalidReportError):
            load_report(spark, out)


class TestPathSafety:
    """P5 analog of reference TestPathSafety (test_core.py:69-159)."""

    def _groups(self, spark, keep_path, delete_path="ok/d.py"):
        from photo_dedup_spark.sources.report import GROUP_SCHEMA

        data = [(1, 2, {"path": keep_path, "size": 1}, [{"path": delete_path, "size": 1}])]
        return spark.createDataFrame(data, GROUP_SCHEMA)

    @pytest.mark.parametrize(
        "bad",
        ["/abs/path.py", "C:evil.py", "", ".", "../up.py", "a/../b.py", "x/..", ".."],
    )
    def test_unsafe_rejected(self, spark, bad):
        from photo_dedup_spark.sources.report import (
            InvalidReportError,
            validate_relative_paths,
        )

        with pytest.raises(InvalidReportError):
            validate_relative_paths(self._groups(spark, bad))

    @pytest.mark.parametrize(
        "ok", ["a/b.py", "dots..inside.py", "..leading_name.py", "d/.."
               "hidden.py"]
    )
    def test_safe_accepted(self, spark, ok):
        from photo_dedup_spark.sources.report import validate_relative_paths

        validate_relative_paths(self._groups(spark, ok))

    def test_dir_match(self):
        from photo_dedup_spark.sources.report import (
            InvalidReportError,
            validate_source_match,
        )

        doc = {"source": "tableA"}
        validate_source_match(doc, "tableA")
        validate_source_match(doc, "tableB", force=True)
        with pytest.raises(InvalidReportError):
            validate_source_match(doc, "tableB")


class TestStrictVerify:
    def test_strict_resplit_in_exact_mode(self, spark, cfg):
        """J7: forced 'collision' via normalized-equal (but byte-different)
        contents — strict mode splits them (scanner.py:645-695 analog:
        the reference forces an md5 collision via monkeypatch,
        test_core.py:1634-1643; normalization plays that role here)."""
        from photo_dedup_spark.pipeline import run_pipeline

        rows = [
            ("r1", "a.py", "c1", "py", "x = 1\n"),
            ("r2", "b.py", "c2", "py", "x = 1  \r\n"),   # norm-equal, raw-diff
            ("r3", "c.py", "c3", "py", "x = 1\n"),        # raw-equal to a.py
        ]
        df = spark.createDataFrame(
            rows, "repo string, path string, commit string, lang string, content string"
        )
        loose = run_pipeline(spark, df, cfg, mode="exact", collect_metrics=False)
        assert loose.assignments.select("cluster_id").distinct().count() == 1
        strict = run_pipeline(
            spark, df, cfg, mode="exact", collect_metrics=False, strict_verify=True
        )
        got = {
            r.path: r.cluster_id for r in strict.assignments.collect()
        }
        assert got["a.py"] == got["c.py"] != got["b.py"]
