"""Spark-parallel deterministic bench corpus.

The scaling criterion (BASELINE.md: efficiency ≥ 0.8 between N and 4N
parallelism) needs a workload where parallel compute dominates fixed
job overhead; the driver's sf0.1 documents table (5k × 300 chars) is
pure overhead at local[32].  This generator plants the same duplicate
structure as corpus.py but at bench scale, generated INSIDE Spark
(mapInPandas over an id range — each row derives only from its id, so
content is identical under any partitioning/parallelism; seed=42).

Row mix per base id (seeded): ~60% unique, ~15% +exact copy,
~10% +near variant (comment/rename perturbation), ~5% +truncation,
~25% license-boilerplate prefix (hot LSH buckets).
"""

from __future__ import annotations

import hashlib
import os
import random
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from photo_dedup_spark.corpus import _LICENSE, _base_file, _perturb_near

BENCH_SCHEMA = "repo string, path string, commit string, lang string, content string"


def _bench_base_file(rng: random.Random, n_funcs: int) -> str:
    """Seeded pseudo source file with a DOC-UNIQUE identifier pool.

    corpus.py's shared 30-word pool gives two RANDOM docs char-shingle
    Jaccard ~0.4 — at bench scale that floods LSH with O(n²·p) junk
    candidate pairs (a 140k-doc corpus would verify hundreds of
    millions).  Real code corpora don't look like that.  Per-doc
    identifiers keep cross-doc Jaccard at structural-fragment level
    (~0.05) while planted variants, built FROM the base, keep theirs."""
    pool = [f"v{rng.randrange(1 << 24):x}" for _ in range(24)]
    parts = []
    for f in range(n_funcs):
        name = f"{rng.choice(pool)}_{f}"
        args = ", ".join(rng.sample(pool, rng.randint(1, 3)))
        parts.append(f"def {name}({args}):")
        for _ in range(rng.randint(6, 14)):
            a, b, c = rng.choice(pool), rng.choice(pool), rng.randint(0, 999)
            parts.append(f"    {a} = {b}_{c} + {rng.choice(pool)}[{c % 7}]")
        parts.append(f"    return {rng.choice(pool)}")
        parts.append("")
    return "\n".join(parts) + "\n"


# --- mega-component chain (round-5 distributed-CC scale evidence) ---
# The north rule's boilerplate case: one giant near-dup component.  A
# literal shared-template family would be an LSH clique (O(m²) verify
# pairs — the exact blow-up the salting/overflow tier exists to refuse),
# so the mega-component is planted as a DRIFTING chain instead: member p
# is a sliding window over a deterministic token stream, so adjacent
# members are near-dups (token overlap 540/660 ⇒ Jaccard ≈ 0.82 > τ=0.7)
# while members two steps apart fall below τ — candidate pairs stay
# O(m), yet connected components must stitch one m-member component
# whose DIAMETER is m (the worst case for label propagation; pointer
# jumping needs its full O(log m) rounds).  This is the evolving-
# boilerplate shape of real corpora (license text v1 → v2 → …).
_CHAIN_TOKENS = 600
_CHAIN_STEP = 60


def _chain_token(t: int) -> str:
    # Knuth multiplicative hash mod a prime: cheap, deterministic,
    # ~16M-token vocabulary so windows are collision-free in practice
    return f"w{(t * 2654435761) % 16777213:x}"


def _chain_member(p: int) -> str:
    # Separators depend on the GLOBAL token index, so the overlapping
    # token range of two windows is BYTE-identical — character shingles
    # then see the full token overlap.  (The first cut of this helper
    # broke lines at per-member-relative positions; the differing
    # newline placement diluted shingle Jaccard of adjacent members to
    # ~0.54 < τ — measured, no chain edges formed at bench scale.)
    start = p * _CHAIN_STEP
    parts = []
    for t in range(start, start + _CHAIN_TOKENS):
        parts.append(_chain_token(t))
        parts.append("\n" if t % 8 == 7 else " ")
    return "".join(parts)


def _rows_for_base(i: int, size_funcs: int, chain_every: int = 0) -> list[tuple]:
    rng = random.Random(1_000_003 * i + 42)
    lang = rng.choice(["py", "java", "c", "js", "txt"])
    base = _bench_base_file(rng, n_funcs=size_funcs + rng.randint(-2, 2))
    if rng.random() < 0.25:
        base = _LICENSE + base
    repo = f"org{i % 997}/proj{i % 131}"

    def row(repo_, path_, content_):
        commit = hashlib.sha1(f"{repo_}:{path_}".encode()).hexdigest()
        return (repo_, path_, commit, lang, content_)

    out = [row(repo, f"src/mod_{i}.{lang}", base)]
    r = rng.random()
    if r < 0.15:
        out.append(row(f"fork{i % 7}/of", f"src/mod_{i}_copy.{lang}", base))
    elif r < 0.25:
        out.append(row(f"near{i % 7}/of", f"src/mod_{i}_v2.{lang}", _perturb_near(rng, base)))
    elif r < 0.30:
        cut = base.rfind("\n", 0, int(len(base) * rng.uniform(0.72, 0.9)))
        out.append(row(f"trunc{i % 7}/of", f"src/mod_{i}_part.{lang}", base[: cut + 1]))
    if chain_every and i % chain_every == 0:
        p = i // chain_every
        content = _chain_member(p)
        commit = hashlib.sha1(f"chain:{p}".encode()).hexdigest()
        out.append(("boiler/chain", f"chain/part_{p}.txt", commit, "txt", content))
    return out


def generate_bench_corpus(
    spark: SparkSession, n_bases: int, size_funcs: int = 18, chain_every: int = 0
) -> DataFrame:
    """~1.17 rows per base; size_funcs≈18 → ~4 KB average content.
    ``chain_every`` > 0 additionally plants one drifting-chain member
    per that many bases (one n_bases/chain_every-member mega-component
    with O(n) candidate pairs — see _chain_member)."""

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                rows.extend(_rows_for_base(int(i), size_funcs, chain_every))
            yield pd.DataFrame(
                rows, columns=["repo", "path", "commit", "lang", "content"]
            )

    seeds = spark.range(n_bases).repartition(64)
    return seeds.mapInPandas(_gen, BENCH_SCHEMA)


def materialize_bench_corpus(
    spark: SparkSession,
    n_bases: int,
    out_dir: str,
    size_funcs: int = 18,
    chain_every: int = 0,
) -> str:
    """Write once, reuse across scaling runs (generation excluded from
    the timed job).  Keyed by (n_bases, size_funcs[, chain_every])."""
    suffix = f"_chain{chain_every}" if chain_every else ""
    path = os.path.join(out_dir, f"bench_corpus_{n_bases}_{size_funcs}{suffix}")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        generate_bench_corpus(spark, n_bases, size_funcs, chain_every).write.mode(
            "overwrite"
        ).parquet(path)
    return path
