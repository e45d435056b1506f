import sys; sys.path.insert(0, "/root/repo")
import os, time
cpus = os.environ.get('P_CPUS','32')
os.environ['SPARK_GRAFT_CPUS'] = cpus
from photo_dedup_spark.session import build_session
from photo_dedup_spark.pipeline import run_pipeline
import __spark_entry__ as m
spark = build_session(app_name='warm-prof', extra_conf={'spark.ui.showConsoleProgress':'false'})
spark.sparkContext.setLogLevel('ERROR')
files = spark.read.parquet('/tmp/spark_graft_bench/bench_corpus_120000_18')
# warm pass
t0=time.monotonic()
run_pipeline(spark, files, m.ENTRY_CONFIG, mode='hybrid', collect_metrics=False).assignments.count()
print('cold', round(time.monotonic()-t0,1), flush=True)
# timed pass with stage breakdown via metrics
t0=time.monotonic()
res = run_pipeline(spark, files, m.ENTRY_CONFIG, mode='hybrid', collect_metrics=False)
res.assignments.count()
print('warm total', round(time.monotonic()-t0,1), 'cpus', cpus, flush=True)
spark.stop()
