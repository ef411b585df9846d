"""Minimal Spark scaling probe: same Python-kernel job at local[N]."""
import os
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession, functions as F

CPUS = int(sys.argv[1])
CONVS = int(sys.argv[2]) if len(sys.argv) > 2 else 150000
TMP = sys.argv[3] if len(sys.argv) > 3 else tempfile.mkdtemp()

spark = (
    SparkSession.builder.master(f"local[{CPUS}]")
    .config("spark.sql.shuffle.partitions", "64")
    .config("spark.driver.memory", "48g")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

from capsbm25 import fixtures as fx
from capsbm25.config import BuildConfig
from capsbm25.postings import extract_pairs

path = os.path.join(TMP, "t")
if not os.path.exists(path):
    t0 = time.time()
    fx.gen_transcripts_spark(spark, CONVS, 42, partitions=64).write.parquet(path)
    print(f"[{CPUS}] gen: {time.time()-t0:.1f}s", flush=True)

docs = spark.read.parquet(path).withColumn("doc_id", F.monotonically_increasing_id())

# 1. pure JVM aggregation
t0 = time.time()
docs.select(F.sum(F.length("text"))).collect()
print(f"[{CPUS}] jvm-agg: {time.time()-t0:.1f}s", flush=True)

# 2. python kernel (pairs extraction), no shuffle
t0 = time.time()
extract_pairs(docs, BuildConfig()).where(F.col("tf") < 0).count()
print(f"[{CPUS}] py-kernel: {time.time()-t0:.1f}s", flush=True)

# 3. shuffle + sort (JVM)
t0 = time.time()
docs.repartition(64, "conv_id").sortWithinPartitions("conv_id", "turn_idx").where(
    F.col("turn_idx") < 0
).count()
print(f"[{CPUS}] shuffle-sort: {time.time()-t0:.1f}s", flush=True)
spark.stop()
