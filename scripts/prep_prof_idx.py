"""Build (once) the bench-shape sf0.1 synthetic index into a
persistent dir for round-8 query profiling. Usage:
  python scripts/prep_prof_idx.py [n_convs] [out_dir]
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession

from capsbm25 import fixtures as fx
from capsbm25.build import build_index
from capsbm25.config import BuildConfig

n_convs = int(sys.argv[1]) if len(sys.argv) > 1 else 30000
out = sys.argv[2] if len(sys.argv) > 2 else "/dev/shm/capsprof_idx"

spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "64")
    .config("spark.driver.memory", "48g")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.ui.enabled", "false")
    .config("spark.local.dir", "/dev/shm/spark-local")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
cfg = BuildConfig(shuffle_partitions=64, num_waves=2)
tpath = out + "_transcripts"
if not os.path.exists(tpath):
    fx.gen_transcripts_spark(spark, n_convs, seed=42, partitions=64)\
        .write.mode("overwrite").parquet(tpath)
t0 = time.time()
res = build_index(spark, spark.read.parquet(tpath), out + "/idx", cfg)
print("build", round(time.time() - t0, 3), "N", res.N)
spark.stop()
