"""Isolate the docs-stage regression at 32 cores."""
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession, functions as F

from capsbm25 import fixtures as fx
from capsbm25.config import BuildConfig
from capsbm25.docids import assign_doc_ids
from capsbm25.tokenize import tokens_expr

spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "64")
    .config("spark.driver.memory", "48g")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
cfg = BuildConfig(num_part_ids=512, shuffle_partitions=64)

tmp = tempfile.mkdtemp()
fx.gen_transcripts_spark(spark, 30000, 42, partitions=64).write.parquet(f"{tmp}/t")
df = spark.read.parquet(f"{tmp}/t")

t0 = time.time()
docs = assign_doc_ids(df, cfg, method="distributed")
print("assign lazy+jobs:", round(time.time() - t0, 1), flush=True)

t0 = time.time()
docs.write.mode("overwrite").parquet(f"{tmp}/d1")
print("write without dl:", round(time.time() - t0, 1), flush=True)

t0 = time.time()
docs.withColumn("dl", F.size(tokens_expr(F.col("text"), cfg)).cast("long")).write.mode(
    "overwrite"
).parquet(f"{tmp}/d2")
print("write with dl:", round(time.time() - t0, 1), flush=True)
spark.stop()
