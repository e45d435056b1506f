import sys

sys.path.insert(0, "/root/repo")
import os
import time

os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
from pyspark.sql import functions as F, Window

from photo_dedup_spark.functions.keys import exact_key_col, norm_key_col
from photo_dedup_spark.functions.normalize import normalize_col
from photo_dedup_spark.functions.signatures import make_signature_struct_udf
from photo_dedup_spark.operators import lsh
from photo_dedup_spark.operators.components import connected_components, exact_star_edges
from photo_dedup_spark.operators.groups import keep_selection
from photo_dedup_spark.operators.verify import verify_pairs
from photo_dedup_spark.pipeline import ingest
from photo_dedup_spark.session import build_session

import __spark_entry__ as m

cfg = m.ENTRY_CONFIG
spark = build_session(
    app_name="profile-stages", extra_conf={"spark.ui.showConsoleProgress": "false"}
)
spark.sparkContext.setLogLevel("ERROR")
t = time.monotonic
files = spark.read.parquet("/tmp/spark_graft_bench/bench_corpus_120000_18")
t0 = t()
docs, _ = ingest(files, cfg, False)
keyed = docs.select(
    "doc_id",
    "repo",
    "path",
    "lang",
    "n_chars",
    "content",
    exact_key_col(F.col("content")).alias("exact_key"),
    norm_key_col(F.col("content")).alias("norm_key"),
).localCheckpoint(eager=True)
print("keys", round(t() - t0, 1), flush=True)
t0 = t()
reps = (
    keyed.withColumn(
        "r", F.row_number().over(Window.partitionBy("norm_key").orderBy("doc_id"))
    )
    .where("r=1")
    .where(F.col("n_chars") <= cfg.content_cap_chars)
)
su = make_signature_struct_udf(cfg)
signed = (
    reps.select("doc_id", normalize_col(F.col("content")).alias("norm_content"))
    .repartition(int(spark.conf.get("spark.sql.shuffle.partitions")))
    .withColumn("sig", su("norm_content"))
    .select(
        "doc_id",
        F.col("sig.simhash").alias("simhash"),
        F.col("sig.band_hashes").alias("band_hashes"),
        F.col("sig.sketch").alias("sketch"),
        F.col("sig.sketch_b").alias("sketch_b"),
    )
    .localCheckpoint(eager=True)
)
print("signatures", round(t() - t0, 1), "reps", signed.count(), flush=True)
t0 = t()
banded = lsh.explode_bands(signed, cfg).unionByName(lsh.explode_simhash_chunks(signed, cfg))
pairs, stats = lsh.candidate_pairs(banded, cfg, num_partitions=64)
pairs = pairs.localCheckpoint(eager=True)
print("candidates", round(t() - t0, 1), "pairs", pairs.count(), flush=True)
t0 = t()
ver = verify_pairs(pairs, signed, cfg)
near = ver.where("is_edge").select("src", "dst").localCheckpoint(eager=True)
print("verify", round(t() - t0, 1), "edges", near.count(), flush=True)
t0 = t()
star = exact_star_edges(keyed, "norm_key")
labels, ccm = connected_components(keyed.select("doc_id"), star.unionByName(near), cfg)
print("cc", round(t() - t0, 1), ccm["cc_iterations"], flush=True)
t0 = t()
sel = keep_selection(
    keyed.select("doc_id", "repo", "path", "lang", "n_chars").join(labels, "doc_id")
)
print("keepsel", round(t() - t0, 1), sel.count(), flush=True)
spark.stop()
