"""Profile pair-extraction strategies + docs-stage cost at bench scale."""
import os
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession, functions as F

from capsbm25 import fixtures as fx
from capsbm25.config import BuildConfig
from capsbm25.postings import extract_pairs
from capsbm25.tokenize import tokens_expr

CPUS = int(os.environ.get("P_CPUS", "32"))
N_CONVS = int(os.environ.get("P_CONVS", "30000"))

spark = (
    SparkSession.builder.master(f"local[{CPUS}]")
    .config("spark.sql.shuffle.partitions", "64")
    .config("spark.driver.memory", "48g")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
cfg = BuildConfig()

tmp = tempfile.mkdtemp()
t0 = time.time()
fx.gen_transcripts_spark(spark, N_CONVS, 42, partitions=64).write.parquet(f"{tmp}/t")
print("gen+write", round(time.time() - t0, 1), flush=True)
docs = spark.read.parquet(f"{tmp}/t").withColumn(
    "doc_id", F.monotonically_increasing_id()
)

t0 = time.time()
n = extract_pairs(docs, cfg).count()
print("pairs arrow-kernel:", n, round(time.time() - t0, 1), flush=True)

t0 = time.time()
toks = docs.select("doc_id", tokens_expr(F.col("text"), cfg).alias("toks"))
pairs_sql = (
    toks.select("doc_id", F.size("toks").alias("dl"), F.explode("toks").alias("term"))
    .groupBy("term", "doc_id")
    .agg(F.count("*").alias("tf"), F.first("dl").alias("dl"))
)
print("pairs explode+groupBy:", pairs_sql.count(), round(time.time() - t0, 1), flush=True)

t0 = time.time()
rl = (
    toks.withColumn("sorted_t", F.array_sort("toks"))
    .withColumn(
        "bnd",
        F.expr(
            "filter(sequence(0, size(sorted_t)-1),"
            " i -> i = 0 OR sorted_t[i] != sorted_t[i-1])"
        ),
    )
    .withColumn(
        "entries",
        F.expr(
            """
       transform(sequence(0, size(bnd)-1),
         k -> struct(sorted_t[bnd[k]] AS term,
                     CAST((CASE WHEN k = size(bnd)-1 THEN size(sorted_t)
                           ELSE bnd[k+1] END) - bnd[k] AS INT) AS tf))
    """
        ),
    )
    .where(F.size("sorted_t") > 0)
    .select("doc_id", F.size("sorted_t").alias("dl"), F.explode("entries").alias("e"))
    .select(F.col("e.term").alias("term"), "doc_id", F.col("e.tf").alias("tf"), "dl")
)
print("pairs run-length JVM:", rl.count(), round(time.time() - t0, 1), flush=True)

# docs-stage: where does time go
from capsbm25.docids import assign_doc_ids

t0 = time.time()
cfg2 = BuildConfig(num_part_ids=512, shuffle_partitions=64)
src = spark.read.parquet(f"{tmp}/t")
out = assign_doc_ids(src, cfg2, method="distributed")
out.write.mode("overwrite").parquet(f"{tmp}/docs")
print("assign_doc_ids+write:", round(time.time() - t0, 1), flush=True)

t0 = time.time()
spark.read.parquet(f"{tmp}/docs").select(
    F.sum(F.size(tokens_expr(F.col("text"), cfg)))
).collect()
print("jvm tokenize scan (dl):", round(time.time() - t0, 1), flush=True)
spark.stop()
