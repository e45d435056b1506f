"""Connected-components unit semantics (reference BFS,
/root/reference/photo_dedup/scanner.py:286-310)."""

import pytest

from photo_dedup_spark.operators.components import connected_components, exact_star_edges


def _labels(spark, cfg, nodes, edges):
    n = spark.createDataFrame([(x,) for x in nodes], "doc_id long")
    e = spark.createDataFrame(edges, "src long, dst long")
    labels, metrics = connected_components(n, e, cfg)
    return {r.doc_id: r.cluster_id for r in labels.collect()}, metrics


class TestConnectedComponents:
    def test_chain_collapses_to_min(self, spark, cfg):
        got, m = _labels(spark, cfg, range(1, 8), [(1, 2), (2, 3), (3, 4), (5, 6)])
        assert got[1] == got[2] == got[3] == got[4] == 1
        assert got[5] == got[6] == 5
        assert got[7] == 7
        assert m["cc_changed_per_iter"][-1] == 0

    def test_direction_agnostic(self, spark, cfg):
        # edges given (big → small): min label still propagates
        got, _ = _labels(spark, cfg, [1, 2, 3], [(3, 2), (2, 1)])
        assert got == {1: 1, 2: 1, 3: 1}

    def test_two_stars_merged_by_bridge(self, spark, cfg):
        # hybrid merge J6 (scanner.py:583-622): two exact-group stars
        # linked by one verified near-edge become one cluster
        star1 = [(10, 11), (10, 12)]
        star2 = [(20, 21), (20, 22)]
        bridge = [(12, 21)]
        got, _ = _labels(spark, cfg, [10, 11, 12, 20, 21, 22], star1 + star2 + bridge)
        assert len(set(got.values())) == 1

    def test_exact_star_edges_shape(self, spark):
        keyed = spark.createDataFrame(
            [(1, "k1"), (2, "k1"), (3, "k1"), (4, "k2"), (5, "k3")],
            "doc_id long, norm_key string",
        )
        edges = {(r.src, r.dst) for r in exact_star_edges(keyed).collect()}
        assert edges == {(1, 2), (1, 3)}  # star from min; singletons none

    def test_long_chain_converges_within_bound(self, spark, cfg):
        n = 40
        got, m = _labels(spark, cfg, range(n), [(i, i + 1) for i in range(n - 1)])
        assert set(got.values()) == {0}
        assert m["cc_iterations"] <= cfg.cc_max_iters
