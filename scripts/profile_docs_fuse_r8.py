"""Round-8 session 2: attribute the docs stage's cost at bench scale.

Times, on the bench corpus/session shape, 3x each in one session:
  a. dl-only pass: scan + dl_udf, noop sink (the tokenize+scan cost)
  b. full docs stage shape: dl + id assign + write (what build pays)
  c. pairs-shaped id exchange probe: the same exchange extract_runs
     already pays, with vs without conv_id/turn_idx crossing the
     Arrow boundary (the marginal cost of feeding stats to the fused
     kernel)
Usage: python scripts/profile_docs_fuse_r8.py
"""
import os
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession, functions as F

from capsbm25 import fixtures as fx
from capsbm25.catalog import write_table
from capsbm25.config import BuildConfig
from capsbm25.docids import assign_doc_ids, compute_id_plan, make_dl_udf

N_CONVS = int(os.environ.get("PROF_CONVS", "30000"))  # sf0.1 bench size

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

tmp = tempfile.mkdtemp(prefix="capsprof_", dir=scratch)
t0 = time.time()
spark.range(128, numPartitions=32).mapInPandas(
    lambda it: it, schema="id long").count()
print(f"warmup {time.time()-t0:.3f}", flush=True)

t0 = time.time()
fx.gen_transcripts_spark(spark, N_CONVS, seed=42, partitions=64).write.mode(
    "overwrite").parquet(f"{tmp}/t")
print(f"gen {time.time()-t0:.3f}", flush=True)
transcripts = spark.read.parquet(f"{tmp}/t")

cfg = BuildConfig(shuffle_partitions=64, num_waves=2)

t0 = time.time()
id_plan = compute_id_plan(transcripts, cfg)
print(f"id_plan {time.time()-t0:.3f}  n_rows={id_plan.n_rows}", flush=True)

for rep in range(3):
    # a. dl-only pass, noop sink
    t0 = time.time()
    narrow = transcripts.select(
        "conv_id", "turn_idx", make_dl_udf(cfg)(F.col("text")).alias("dl"))
    narrow.write.format("noop").mode("overwrite").save()
    print(f"rep{rep} a.dl_noop {time.time()-t0:.3f}", flush=True)

    # b. full docs-stage shape (dl + id assign + parquet write)
    t0 = time.time()
    stats = assign_doc_ids(narrow, cfg, id_plan=id_plan).select(
        "doc_id", "conv_id", "turn_idx", "dl")
    write_table(stats, f"{tmp}/doc_stats_{rep}")
    print(f"rep{rep} b.docs_full {time.time()-t0:.3f}", flush=True)

    # c. the pairs id exchange, text only vs text+keys, noop sink
    for label, cols in (("text_only", ["part_id", "text"]),
                        ("with_keys", ["part_id", "conv_id",
                                       "turn_idx", "text"])):
        t0 = time.time()
        src = (
            transcripts.withColumn(
                "part_id", id_plan.part_of_udf()("conv_id", "turn_idx"))
            .repartition(
                min(cfg.shuffle_partitions, len(id_plan.offsets) or 1),
                "part_id")
            .sortWithinPartitions("part_id", "conv_id", "turn_idx")
            .select(*cols)
        )

        def probe(it):
            n = 0
            for pdf in it:
                n += len(pdf)
            import pandas as pd
            yield pd.DataFrame({"n": [n]})

        src.mapInPandas(probe, schema="n long").write.format(
            "noop").mode("overwrite").save()
        print(f"rep{rep} c.exchange_{label} {time.time()-t0:.3f}",
              flush=True)

spark.stop()
