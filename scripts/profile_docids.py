"""Time each sub-job of assign_doc_ids at bench scale."""
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")
import numpy as np
from pyspark.sql import SparkSession, functions as F

from capsbm25 import fixtures as fx
from capsbm25.config import BuildConfig
from capsbm25.docids import _key

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

t0 = time.time(); n = df.count(); print("count:", round(time.time()-t0, 2), flush=True)

t0 = time.time()
target = cfg.num_part_ids * cfg.samples_per_part
frac = min(1.0, (target * 1.2) / n)
sample = df.select("conv_id", "turn_idx").sample(fraction=frac, seed=42).toPandas()
print("sample:", round(time.time()-t0, 2), len(sample), flush=True)

keys = np.sort(_key(sample["conv_id"], sample["turn_idx"]))
n_eff = min(cfg.num_part_ids, max(1, keys.size))
cuts = [keys[int(len(keys) * (i + 1) / n_eff) - 1] for i in range(n_eff - 1)]
splitters = np.array(sorted(set(cuts)), dtype=object)

def assign_part(it):
    for pdf in it:
        pdf = pdf.copy()
        pdf["part_id"] = np.searchsorted(
            splitters, _key(pdf["conv_id"], pdf["turn_idx"]), side="right"
        ).astype(np.int32)
        yield pdf

from pyspark.sql.types import IntegerType, StructField, StructType
schema_with_part = StructType(list(df.schema.fields) + [StructField("part_id", IntegerType())])
wp = df.mapInPandas(assign_part, schema=schema_with_part)

t0 = time.time()
counts = wp.groupBy("part_id").count().collect()
print("counts job:", round(time.time()-t0, 2), flush=True)

t0 = time.time()
shuffled = wp.repartition(64, "part_id").sortWithinPartitions("part_id", "conv_id", "turn_idx")
shuffled.write.mode("overwrite").parquet(f"{tmp}/d")
print("shuffle+sort+write:", round(time.time()-t0, 2), flush=True)
spark.stop()
