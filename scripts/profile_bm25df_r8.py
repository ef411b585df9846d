"""Decompose bm25_documents_dataframe: agg job vs topk job vs plan
overhead, cold and warm, on the bench session shape.
Usage: python scripts/profile_bm25df_r8.py [sf_dir]"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

from pyspark.sql import SparkSession

scratch = "/dev/shm" if os.path.isdir("/dev/shm") else None
spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "64")
    .config("spark.driver.memory", "48g")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.ui.enabled", "false")
    .config("spark.local.dir", (scratch or "/tmp") + "/spark-local")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
t0 = time.time()
spark.range(128, numPartitions=32).mapInPandas(
    lambda it: it, schema="id long").count()
print(f"warmup {time.time()-t0:.3f}", flush=True)

import __spark_entry__ as E
from pyspark.sql import functions as F
from capsbm25.tokenize import tokens_expr

for rep in range(4):
    t0 = time.time()
    E.q_bm25_topk_dataframe(spark, SF).collect()
    print(f"rep{rep} entry_total {time.time()-t0:.3f}", flush=True)

# piecewise (warm): the agg pass alone, then the topk pass alone
d = E._documents(spark, SF)
toks = tokens_expr(F.col("text"), E.CFG)
tf_cols = [
    F.size(F.filter(toks, (lambda tt: (lambda t: t == F.lit(tt)))(term))).alias(f"tf_{i}")
    for i, term in enumerate(E.BM25_QUERY_TERMS)
]
base = d.select("doc_id", "source", F.size(toks).alias("dl"), *tf_cols)
for rep in range(3):
    t0 = time.time()
    base.agg(
        F.count("*").alias("n"), F.sum("dl").alias("sum_dl"),
        *[F.count(F.when(F.col(f"tf_{i}") > 0, F.lit(1))).alias(f"df_{i}")
          for i in range(len(E.BM25_QUERY_TERMS))],
    ).collect()
    t1 = time.time()
    print(f"rep{rep} agg_job {t1-t0:.3f}", flush=True)
# table touch alone
t0 = time.time()
d.selectExpr("sum(length(text))").collect()
print(f"scan_only {time.time()-t0:.3f}", flush=True)
t0 = time.time()
d.select(F.size(toks).alias("s")).selectExpr("sum(s)").collect()
print(f"tokenize_only {time.time()-t0:.3f}", flush=True)
spark.stop()
