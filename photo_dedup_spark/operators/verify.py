"""Stage-2 candidate verification (the RMS-verifier analog).

The reference never trusts the perceptual signature alone: dHash
candidates within Hamming ≤ 20 are re-verified with a pixel RMS
difference, and any failure yields ``inf`` — the safe "don't merge"
default (/root/reference/photo_dedup/hasher.py:238-298, esp. 283-293;
consumed at scanner.py:382-395).

Our verifier works on **per-doc shingle sketches**, not content: the
signature stage stores a mod-2^b sparsified shingle set per document
(functions/signatures.py ``sketch_py``), so the pair join moves a few
KB per doc instead of the full text — re-shingling content per pair
would stream O(pairs × content) bytes through the shuffle and the
Arrow boundary, which measured 20-30× slower at bench scale and, at
100 TB, would dwarf every other stage.  Docs under the sketch cap are
stored exactly, so the estimate degenerates to true Jaccard for
typical source files; giants estimate with ~1/sqrt(k) error.

Per pair we compute:
  * sketch Jaccard (stage-2 verify, RMS analog),
  * sketch containment of the smaller set (north-rule substring check
    for truncated/vendored copies),
  * 256-bit SimHash Hamming — JVM-side ``bit_count(xor)`` on the
    signature words.

An edge survives iff ``jaccard >= τ`` OR ``containment >= τ_c``; the
Hamming path is candidate-generation only (mirrors the reference where
dHash proposes and RMS disposes).  Per-pair exceptions inside the UDF
yield a non-match verdict (the ``inf`` contract).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, StructField, StructType

from photo_dedup_spark.config import DEFAULT_CONFIG, DedupConfig

_VERDICT = StructType(
    [
        StructField("jaccard", DoubleType()),
        StructField("containment", DoubleType()),
    ]
)


def make_verify_udf(cfg: DedupConfig = DEFAULT_CONFIG, failure_counter=None):
    """pandas UDF (sketch_a, b_a, sketch_b, b_b) -> struct(jaccard,
    containment) via exact set arithmetic on the common sampled
    universe.

    Batch formulation: instead of one ``np.intersect1d`` call per pair
    (interpreter-bound — the flagship's dominant Python cost), the whole
    Arrow batch's sketches are concatenated with their pair index and
    intersected in ONE lexsort + adjacent-duplicate count.  Per-pair
    work is just a zero-copy ``frombuffer`` and a ``searchsorted``
    prefix slice (sketches are stored sorted, so level-filtering is a
    prefix cut).  Bit-identical to the per-pair ``sketch_overlap_py``
    arithmetic — integer counts and one float64 division per pair.

    *failure_counter*: optional Spark accumulator — per-pair verifier
    failures are COUNTED, not just swallowed (the reference counts
    per-item errors while dropping them, scanner.py:471-479 / A5)."""

    def _verify(
        sk_a: pd.Series, b_a: pd.Series, sk_b: pd.Series, b_b: pd.Series
    ) -> pd.DataFrame:
        n = len(sk_a)
        jac = np.zeros(n, dtype=np.float64)
        con = np.zeros(n, dtype=np.float64)
        lens_a = np.zeros(n, dtype=np.int64)
        lens_b = np.zeros(n, dtype=np.int64)
        ok = np.zeros(n, dtype=bool)
        both_empty_exact = np.zeros(n, dtype=bool)
        vals_a: list[np.ndarray] = []
        vals_b: list[np.ndarray] = []
        failures = 0
        a_vals, b_vals = sk_a.values, sk_b.values
        ba_vals, bb_vals = b_a.values, b_b.values
        for i in range(n):
            a, b = a_vals[i], b_vals[i]
            try:
                if a is None or b is None:
                    raise ValueError("missing sketch")
                ba, bb = int(ba_vals[i]), int(bb_vals[i])
                ua = np.frombuffer(a, dtype="<i8").view(np.uint64)
                ub = np.frombuffer(b, dtype="<i8").view(np.uint64)
                lvl = max(ba, bb)
                if lvl:
                    cut = np.uint64(1) << np.uint64(64 - lvl)
                    if ba < lvl:
                        ua = ua[: np.searchsorted(ua, cut)]
                    if bb < lvl:
                        ub = ub[: np.searchsorted(ub, cut)]
                if ua.size == 0 or ub.size == 0:
                    # safe default (0,0), except both-genuinely-empty
                    # docs which are identical ⇒ (1,1) — mirrors
                    # sketch_overlap_py exactly
                    both_empty_exact[i] = ua.size == 0 and ub.size == 0 and lvl == 0
                    continue
                lens_a[i], lens_b[i] = ua.size, ub.size
                vals_a.append(ua)
                vals_b.append(ub)
                ok[i] = True
            except Exception:
                # safe default: never merge on verifier failure
                # (mirrors hasher.py:283-293 returning inf)
                failures += 1
        if vals_a:
            idx_ok = np.flatnonzero(ok)
            idx = np.concatenate(
                [np.repeat(idx_ok, lens_a[idx_ok]), np.repeat(idx_ok, lens_b[idx_ok])]
            )
            val = np.concatenate(vals_a + vals_b)
            order = np.lexsort((val, idx))
            idx = idx[order]
            val = val[order]
            # within a pair each side is unique+sorted, so an adjacent
            # (idx, val) duplicate is exactly one element from each side
            dup = (idx[1:] == idx[:-1]) & (val[1:] == val[:-1])
            inter = np.bincount(idx[:-1][dup], minlength=n)
            union = lens_a + lens_b - inter
            small = np.minimum(lens_a, lens_b)
            with np.errstate(divide="ignore", invalid="ignore"):
                jac = np.where(ok, inter / union, 0.0)
                con = np.where(ok, inter / small, 0.0)
        jac[both_empty_exact] = 1.0
        con[both_empty_exact] = 1.0
        if failures and failure_counter is not None:
            failure_counter.add(failures)
        return pd.DataFrame({"jaccard": jac, "containment": con})

    return F.pandas_udf(_verify, _VERDICT)


def hamming_col(sim_a, sim_b, n_words: int):
    """JVM-side Hamming distance over int64 signature words:
    sum(bit_count(a[i] ^ b[i])) — stays inside whole-stage codegen."""
    terms = [
        F.bit_count(sim_a.getItem(i).bitwiseXOR(sim_b.getItem(i)))
        for i in range(n_words)
    ]
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def verify_pairs(
    pairs: DataFrame,
    docs: DataFrame,
    cfg: DedupConfig = DEFAULT_CONFIG,
    failure_counter=None,
) -> DataFrame:
    """Join candidate pairs to per-doc (sketch, sketch_b, simhash) and
    emit verified edges: (src, dst, jaccard, containment, hamming,
    is_edge)."""
    a = docs.select(
        F.col("doc_id").alias("src"),
        F.col("sketch").alias("sk_a"),
        F.col("sketch_b").alias("b_a"),
        F.col("simhash").alias("sim_a"),
    )
    b = docs.select(
        F.col("doc_id").alias("dst"),
        F.col("sketch").alias("sk_b"),
        F.col("sketch_b").alias("b_b"),
        F.col("simhash").alias("sim_b"),
    )
    verify_udf = make_verify_udf(cfg, failure_counter)
    joined = pairs.join(a, "src").join(b, "dst")
    scored = joined.withColumn(
        "verdict",
        verify_udf(F.col("sk_a"), F.col("b_a"), F.col("sk_b"), F.col("b_b")),
    ).withColumn(
        "hamming",
        F.when(
            F.col("sim_a").isNotNull() & F.col("sim_b").isNotNull(),
            hamming_col(F.col("sim_a"), F.col("sim_b"), cfg.simhash_words),
        ),
    )
    return scored.select(
        "src",
        "dst",
        F.col("verdict.jaccard").alias("jaccard"),
        F.col("verdict.containment").alias("containment"),
        "hamming",
        (
            (F.col("verdict.jaccard") >= F.lit(cfg.jaccard_threshold))
            | (F.col("verdict.containment") >= F.lit(cfg.containment_threshold))
        ).alias("is_edge"),
    )
