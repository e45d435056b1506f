"""Rep-verify split: oracle-order greedy + megacomponent bucketing.

VERDICT r2 #2: a ~50k-member boilerplate component (reference scenario
test_core.py:1769-1818 at corpus scale) must not funnel into one
quadratic Python task.  Components over ``split_max_component`` are
pre-bucketed by SimHash prefix; this pins (a) completion within a hard
time bound, (b) deterministic, prototype-coherent clusters, and
(c) the unchanged exact-greedy path for normal-size components.
"""

import time

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from photo_dedup_spark.functions.signatures import sketch_to_bytes
from photo_dedup_spark.operators.repsplit import (
    oversized_component_count,
    rep_verify_split,
)

N_MEMBERS = 50_000
N_PROTOS = 200


def _prototypes(rng):
    protos = []
    for _ in range(N_PROTOS):
        vals = np.sort(
            np.unique(rng.randint(0, 1 << 62, size=64).astype(np.uint64))
        )
        sketch = sketch_to_bytes(vals.view(np.int64))
        simhash = rng.randint(-(1 << 62), 1 << 62, size=4).astype(np.int64).tolist()
        protos.append((sketch, simhash))
    return protos


@pytest.fixture(scope="module")
def mega_frames(spark):
    rng = np.random.RandomState(11)
    protos = _prototypes(rng)
    proto_of = rng.randint(0, N_PROTOS, size=N_MEMBERS)
    doc_ids = np.arange(1, N_MEMBERS + 1, dtype=np.int64)
    reps_pdf = pd.DataFrame(
        {
            "doc_id": doc_ids,
            "repo": ["r%05d" % (i % 997) for i in range(N_MEMBERS)],
            "path": ["p/%06d.py" % i for i in range(N_MEMBERS)],
            "sketch": [protos[p][0] for p in proto_of],
            "sketch_b": np.zeros(N_MEMBERS, dtype=np.int32),
            "simhash": [protos[p][1] for p in proto_of],
        }
    )
    reps = spark.createDataFrame(reps_pdf)
    comp = spark.createDataFrame(
        pd.DataFrame({"doc_id": doc_ids, "cluster_id": np.ones(N_MEMBERS, np.int64)})
    )
    return comp, reps, proto_of


class TestMegacomponentSplit:
    def test_50k_component_completes_in_bound(self, spark, cfg, mega_frames):
        comp, reps, proto_of = mega_frames
        assert N_MEMBERS > cfg.split_max_component  # must take the bucketed path
        t0 = time.monotonic()
        out = rep_verify_split(comp, reps, cfg).collect()
        wall = time.monotonic() - t0
        assert wall < 120, f"megacomponent split took {wall:.1f}s"
        assert len(out) == N_MEMBERS

        # identical-sketch members (same prototype) must share a cluster:
        # equal sketches ⇒ jaccard 1 ≥ τ, equal simhash ⇒ same bucket
        label_of = {r.doc_id: r.cluster_id for r in out}
        cluster_of_proto = {}
        for doc_id, p in zip(range(1, N_MEMBERS + 1), proto_of):
            c = label_of[doc_id]
            cluster_of_proto.setdefault(int(p), set()).add(c)
        assert all(len(v) == 1 for v in cluster_of_proto.values())
        # dissimilar prototypes never merge (random 64-element sketches
        # can't reach τ=0.7 jaccard)
        assert len({next(iter(v)) for v in cluster_of_proto.values()}) == N_PROTOS

    def test_oversized_metric_counts_component(self, spark, cfg, mega_frames):
        comp, _, _ = mega_frames
        assert oversized_component_count(comp, cfg) == 1

    def test_small_component_exact_greedy_unchanged(self, spark, cfg):
        # under the cap: bucket 0, oracle-order greedy — chain A≈B≈C
        # splits at C exactly as the reference does
        # B shares 85/115 with A (j=0.739 ≥ τ=0.7, joins A); C shares
        # 85/115 with B but only 70/130 with A (j=0.538, containment
        # 0.7 < 0.9) — C must found its own subgroup: the greedy
        # compares against FOUNDERS only, and B is not a founder
        a = np.arange(0, 100, dtype=np.uint64)
        b = np.concatenate(
            [np.arange(0, 85, dtype=np.uint64), np.arange(1000, 1015, dtype=np.uint64)]
        )
        c = np.concatenate(
            [
                np.arange(15, 85, dtype=np.uint64),
                np.arange(1000, 1015, dtype=np.uint64),
                np.arange(2000, 2015, dtype=np.uint64),
            ]
        )
        rows = []
        for i, vals in enumerate([a, b, c], start=1):
            rows.append(
                (
                    i,
                    "r",
                    f"p/{i}.py",
                    bytearray(sketch_to_bytes(np.unique(vals).view(np.int64))),
                    0,
                    [0, 0, 0, 0],
                )
            )
        reps = spark.createDataFrame(
            rows,
            "doc_id long, repo string, path string, sketch binary,"
            " sketch_b int, simhash array<bigint>",
        )
        comp = spark.createDataFrame(
            [(1, 1), (2, 1), (3, 1)], "doc_id long, cluster_id long"
        )
        got = {r.doc_id: r.cluster_id for r in rep_verify_split(comp, reps).collect()}
        assert got[1] == 1 and got[2] == 1
        assert got[3] == 3, "chain must split at C (reference test_core.py:1769-1818)"
