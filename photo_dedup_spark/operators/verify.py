"""Stage-2 candidate verification (the RMS-verifier analog).

The reference never trusts the perceptual signature alone: dHash
candidates within Hamming ≤ 20 are re-verified with a pixel RMS
difference, and any failure yields ``inf`` — the safe "don't merge"
default (/root/reference/photo_dedup/hasher.py:238-298, esp. 283-293;
consumed at scanner.py:382-395).

Our verifier computes, per candidate pair on **normalized** content:
  * true char-shingle Jaccard similarity          (RMS analog),
  * containment of the smaller shingle set       (north-rule substring
    check for truncated/vendored copies; plain-`in` + shingle-set v1,
    documented suffix-array upgrade path),
  * 256-bit SimHash Hamming distance — computed JVM-side with
    ``bit_count(xor)`` on the signature words (no content needed).

An edge survives iff ``jaccard >= τ`` OR ``containment >= τ_c``; the
Hamming path is candidate-generation only (mirrors the reference where
dHash proposes and RMS disposes).  Per-pair exceptions inside the UDF
yield a non-match verdict (the ``inf`` contract).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, StructField, StructType

from photo_dedup_spark.config import DEFAULT_CONFIG, DedupConfig
from photo_dedup_spark.functions.signatures import shingle_hashes

_VERDICT = StructType(
    [
        StructField("jaccard", DoubleType()),
        StructField("containment", DoubleType()),
    ]
)


def make_verify_udf(cfg: DedupConfig = DEFAULT_CONFIG):
    """pandas UDF (norm_a, norm_b) -> struct(jaccard, containment).

    Contents arrive already normalized; the UDF re-shingles with the
    frozen config and computes exact set overlap (the candidate pair
    count is small relative to the corpus, so full shingling per pair
    is the same representative-verify economics as the reference's
    per-pair RMS, scanner.py:382-395).
    """

    def _verify(norm_a: pd.Series, norm_b: pd.Series) -> pd.DataFrame:
        # Candidate pairs share documents heavily (every doc sits in
        # many pairs), so shingle sets are memoized per distinct text
        # within the Arrow batch — the dominant cost drops from
        # O(pairs × shingling) to O(docs × shingling) + set ops.
        cache: dict[str, frozenset] = {}

        def shingles_of(t: str) -> frozenset:
            s = cache.get(t)
            if s is None:
                s = frozenset(shingle_hashes(t, cfg.shingle_k).tolist())
                cache[t] = s
            return s

        jac, con = [], []
        for a, b in zip(norm_a, norm_b):
            try:
                if a is None or b is None:
                    jac.append(0.0)
                    con.append(0.0)
                    continue
                sa, sb = shingles_of(a), shingles_of(b)
                if not sa or not sb:
                    jac.append(1.0 if a == b else 0.0)
                    con.append(0.0)
                    continue
                inter = len(sa & sb)
                jac.append(inter / (len(sa) + len(sb) - inter))
                small, big = (sa, sb) if len(sa) <= len(sb) else (sb, sa)
                if inter == len(small):
                    con.append(1.0)
                else:
                    # substring fast-path: literal containment implies
                    # shingle containment 1.0 (suffix-array upgrade path)
                    small_t, big_t = (a, b) if len(a) <= len(b) else (b, a)
                    if small_t and small_t in big_t:
                        con.append(1.0)
                    else:
                        con.append(len(small & big) / len(small))
            except Exception:
                # safe default: never merge on verifier failure
                # (mirrors hasher.py:283-293 returning inf)
                jac.append(0.0)
                con.append(0.0)
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
) -> DataFrame:
    """Join candidate pairs back to normalized content + simhash and
    emit verified edges.

    *docs* must carry (doc_id, norm_content, simhash).  Returns
    (src, dst, jaccard, containment, hamming, is_edge).
    """
    a = docs.select(
        F.col("doc_id").alias("src"),
        F.col("norm_content").alias("norm_a"),
        F.col("simhash").alias("sim_a"),
    )
    b = docs.select(
        F.col("doc_id").alias("dst"),
        F.col("norm_content").alias("norm_b"),
        F.col("simhash").alias("sim_b"),
    )
    verify_udf = make_verify_udf(cfg)
    joined = pairs.join(a, "src").join(b, "dst")
    scored = joined.withColumn(
        "verdict", verify_udf(F.col("norm_a"), F.col("norm_b"))
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
