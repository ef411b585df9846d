"""Dump the pairs-stage physical plan (the fused extract_runs frame,
with and without doc-stats emission) for plans/r08 evidence.
Usage: python scripts/dump_pairs_plan_r8.py <out.txt> [emit]"""
import sys

sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession, functions as F

from capsbm25 import fixtures as fx
from capsbm25.config import BuildConfig
from capsbm25.docids import compute_id_plan
from capsbm25.partition import plan_from_sample
from capsbm25.postings import extract_pairs, extract_runs
from capsbm25.catalog import arrow_collect

out_path = sys.argv[1]
emit = len(sys.argv) > 2 and sys.argv[2] == "emit"

spark = (
    SparkSession.builder.master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
cfg = BuildConfig(num_part_ids=12, shuffle_partitions=4, num_waves=2)
pdf = fx.gen_transcripts_pdf(80, 42)
df = spark.createDataFrame(pdf)
id_plan = compute_id_plan(df, cfg)
plan = plan_from_sample(
    arrow_collect(extract_pairs(
        df.sample(fraction=1.0, seed=1).select(
            F.monotonically_increasing_id().alias("doc_id"), "text"), cfg)
        .select("term", "tf")), cfg)
kw = dict(emit_doc_stats=True) if emit else {}
pw = extract_runs(df.select("conv_id", "turn_idx", "text"), cfg,
                  plan=plan, id_plan=id_plan, **kw)
if emit:
    pw = pw.withColumn(
        "wave", F.when(F.col("part_id") < 0, F.lit(-1))
        .otherwise(F.col("part_id") % cfg.num_waves).cast("int"))
else:
    pw = pw.withColumn("wave", (F.col("part_id") % cfg.num_waves).cast("int"))
with open(out_path, "w") as f:
    f.write(pw._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted")))
print("wrote", out_path)
spark.stop()
