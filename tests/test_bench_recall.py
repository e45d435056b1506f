"""Planted-truth recall at BENCH scale.

The recall/precision gates in tests/test_recall.py compare against the
sequential oracle on a ~600-row corpus — thorough, but small.  The
scaling bench runs on photo_dedup_spark/benchcorpus.py corpora (156k+
rows) whose duplicate structure is PLANTED (each variant row derives
from its base id), so ground truth is known by construction at any
size without running an oracle.  This test runs the full pipeline on a
~10k-row bench corpus — 20× the oracle gate's scale, same DEFAULT
frozen config as the bench — and checks:

* every planted exact-copy and near-variant row clusters with its base
  (recall ≥ 0.99 against planted truth);
* distinct bases stay apart (the generator keeps cross-base Jaccard at
  structural-fragment level ~0.05): cross-base merges ≤ 1%.

Truncation plants are intentionally NOT gated here: at 72-90% cuts
their Jaccard straddles τ=0.7, so their inclusion is config-dependent
by design (the containment leg of verify is gated separately in
tests/test_recall.py and the substring operators).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from photo_dedup_spark.config import DEFAULT_CONFIG
from photo_dedup_spark.pipeline import run_pipeline


@pytest.fixture(scope="module")
def bench_assignments(spark):
    from photo_dedup_spark.benchcorpus import generate_bench_corpus

    df = generate_bench_corpus(spark, n_bases=8000)
    res = run_pipeline(
        spark, df, DEFAULT_CONFIG, mode="hybrid", collect_metrics=False
    )
    out = (
        res.assignments.select(
            "repo",
            F.regexp_extract("path", r"mod_(\d+)", 1).cast("long").alias("base"),
            "cluster_id",
        )
        .collect()
    )
    return out


class TestBenchScaleRecall:
    def test_planted_exact_and_near_recall(self, bench_assignments):
        base_cluster = {
            r.base: r.cluster_id
            for r in bench_assignments
            if r.repo.startswith("org")
        }
        planted = [
            r
            for r in bench_assignments
            if r.repo.startswith(("fork", "near"))
        ]
        assert len(planted) > 1000, "fixture too small to be meaningful"
        hits = sum(
            1 for r in planted if base_cluster.get(r.base) == r.cluster_id
        )
        recall = hits / len(planted)
        assert recall >= 0.99, f"planted recall {recall:.4f} ({hits}/{len(planted)})"

    def test_distinct_bases_stay_apart(self, bench_assignments):
        from collections import defaultdict

        members = defaultdict(set)
        for r in bench_assignments:
            members[r.cluster_id].add(r.base)
        multi_base = sum(1 for s in members.values() if len(s) > 1)
        frac = multi_base / len(members)
        assert frac <= 0.01, f"{multi_base}/{len(members)} clusters mix bases"
