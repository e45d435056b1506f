"""photo_dedup_spark — a PySpark-native near-duplicate detection and
clustering engine with the query/data-processing capabilities of the
reference ``rockon8765/photo-dedup`` (a sequential single-machine photo
dedup tool), re-expressed Spark-first over a table of source-code files
``(repo, path, commit, lang, content)``.

Pipeline (SURVEY.md §3.1):
    ingest → exact sha256 keys → MinHash/SimHash signatures (pandas UDFs)
    → LSH band candidates (repartitioned + skew-salted self-join)
    → Jaccard/Hamming/containment verify → iterative connected components
    → keep-selection window → report + action plan.

Nothing in here is a port: the reference's os.walk/hash-dict/BK-tree
internals (reference scanner.py) are replaced by DataFrame operators;
only the *semantics* (duplicate grouping, deterministic keep selection,
reversible action plan) are reproduced.
"""

from photo_dedup_spark.config import DedupConfig

__all__ = ["DedupConfig"]
__version__ = "0.1.0"
