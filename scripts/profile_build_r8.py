"""Round-8: decompose the build's wall clock job-by-job at bench scale.

Times each sub-job of the docs stage (id-plan sample, id-plan counts,
doc_stats write), the pairs stage, each wave (split into assemble write
vs checksum read-back), hot_merge and dictionary — on the same corpus /
session shape as bench.py. Output: one line per job.
"""
import os
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession, functions as F

from capsbm25 import fixtures as fx
from capsbm25.config import BuildConfig

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
spark.range(128, numPartitions=32).mapInPandas(lambda it: it, schema="id long").count()
print(f"warmup {time.time()-t0:.3f}", flush=True)

t0 = time.time()
fx.gen_transcripts_spark(spark, N_CONVS, seed=42, partitions=64).write.mode(
    "overwrite").parquet(f"{tmp}/t")
print(f"gen {time.time()-t0:.3f}", flush=True)
transcripts = spark.read.parquet(f"{tmp}/t")

cfg = BuildConfig(shuffle_partitions=64, num_waves=2)

# ---- docs stage decomposition ----
from pyspark.sql import Observation
from capsbm25.catalog import arrow_collect, write_table
from capsbm25.docids import (assign_doc_ids, compute_id_plan, make_dl_udf,
                             IdPlan)
import numpy as np


def timed(name, fn):
    t0 = time.time()
    r = fn()
    print(f"{name} {time.time()-t0:.3f}", flush=True)
    return r


# job 1: sample + count
def j1():
    obs = Observation()
    n_parts = cfg.num_part_ids or max(64, cfg.shuffle_partitions * 4)
    target = n_parts * cfg.samples_per_part
    pri = F.xxhash64("conv_id", "turn_idx", F.lit(cfg.seed))
    sample = arrow_collect(
        transcripts.select("conv_id", "turn_idx")
        .observe(obs, F.count(F.lit(1)).alias("n"))
        .orderBy(pri, "conv_id", "turn_idx")
        .limit(int(target * 1.2))
    )
    return sample, int(obs.get["n"])


sample, n_rows = timed("docs.j1_sample", j1)

id_plan = timed("docs.id_plan_full(compute_id_plan: j1+j2)",
                lambda: compute_id_plan(transcripts, cfg))

# j2 alone (counts with part_of UDF)
def j2():
    return {
        r["part_id"]: r["cnt"]
        for r in transcripts.withColumn(
            "part_id", id_plan.part_of_udf()("conv_id", "turn_idx")
        ).groupBy("part_id").agg(F.count("*").alias("cnt")).collect()
    }


timed("docs.j2_counts", j2)


# j3: dl + assign + write
def j3():
    narrow = transcripts.select(
        "conv_id", "turn_idx", make_dl_udf(cfg)(F.col("text")).alias("dl")
    )
    stats = assign_doc_ids(narrow, cfg, id_plan=id_plan).select(
        "doc_id", "conv_id", "turn_idx", "dl"
    )
    obs = Observation("docs")
    stats = stats.observe(obs, F.count(F.lit(1)).alias("n"),
                          F.sum("dl").alias("sum_dl"))
    write_table(stats, f"{tmp}/doc_stats")
    return obs.get


m = timed("docs.j3_dl_assign_write", j3)
N = int(m["n"]); avgdl = (m["sum_dl"] or 0) / N
cfg = cfg.resolve_parts(N)

# ---- plan stage ----
from capsbm25.postings import extract_pairs, extract_runs, assemble_postings, merge_hot_partials
from capsbm25.partition import plan_from_sample


def splan():
    target = cfg.num_part_ids * cfg.samples_per_part
    frac = cfg.sample_fraction or min(1.0, target / max(1, N * 20))
    sample_src = transcripts.sample(fraction=frac, seed=cfg.seed).select(
        F.monotonically_increasing_id().alias("doc_id"), "text"
    )
    s = extract_pairs(sample_src, cfg)
    return plan_from_sample(arrow_collect(s.select("term", "tf")), cfg)


plan = timed("plan", splan)

# ---- pairs stage ----
def spairs():
    pw = extract_runs(
        transcripts.select("conv_id", "turn_idx", "text"),
        cfg, plan=plan, id_plan=id_plan,
    ).withColumn("wave", (F.col("part_id") % cfg.num_waves).cast("int"))
    write_table(pw, f"{tmp}/pairs", partition_by=["wave"])


timed("pairs", spairs)

# ---- waves ----
for w in range(cfg.num_waves):
    wave_runs = spark.read.parquet(f"{tmp}/pairs/wave={w}")
    out = assemble_postings(wave_runs, plan, N, avgdl, cfg)
    timed(f"wave{w}.assemble_write",
          lambda: write_table(out, f"{tmp}/postings/wave={w}",
                              partition_by=["part_id"]))
    timed(f"wave{w}.checksum", lambda: spark.read.parquet(
        f"{tmp}/postings/wave={w}").agg(
        F.coalesce(F.bit_xor(F.xxhash64("term", "df", "cf")), F.lit(0)),
        F.count("*")).collect())

# ---- hot merge: full-scan vs pruned ----
def hot_full():
    allp = spark.read.parquet(f"{tmp}/postings")
    partials = allp.where(F.col("partial"))
    if partials.isEmpty():
        return 0
    merged = merge_hot_partials(partials.drop("wave"), N, avgdl, cfg)
    write_table(merged, f"{tmp}/postings/wave=9999", partition_by=["part_id"])


timed("hot_merge.full_scan", hot_full)
import shutil
shutil.rmtree(f"{tmp}/postings/wave=9999", ignore_errors=True)


def hot_pruned():
    allp = spark.read.parquet(f"{tmp}/postings").where(
        F.col("part_id") >= plan.n_normal)
    partials = allp.where(F.col("partial"))
    if partials.isEmpty():
        return 0
    merged = merge_hot_partials(partials.drop("wave"), N, avgdl, cfg)
    write_table(merged, f"{tmp}/postings/wave=9999", partition_by=["part_id"])


timed("hot_merge.pruned", hot_pruned)

timed("hot_merge.checksum", lambda: spark.read.parquet(
    f"{tmp}/postings/wave=9999").agg(
    F.coalesce(F.bit_xor(F.xxhash64("term", "df", "cf")), F.lit(0)),
    F.count("*")).collect())

# ---- dictionary ----
from capsbm25.build import load_postings as _lp


def sdict():
    d = (
        spark.read.parquet(f"{tmp}/postings").where(~F.col("partial"))
        .select("term", "part_id", "df", "cf",
                F.length("term").cast("int").alias("tlen"))
        .sortWithinPartitions("term")
    )
    write_table(d, f"{tmp}/dictionary")


timed("dictionary", sdict)

shutil.rmtree(tmp, ignore_errors=True)
spark.stop()
