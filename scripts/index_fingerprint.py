"""Build the fixture index and print a full-row content fingerprint of
the final postings (every column) — used to prove build-path refactors
keep the persisted index byte-identical. (Round 8 dropped the stored
block_max column, so the reference fingerprints changed once, that
round, and are stable since.)"""

import sys

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, ".")

from capsbm25 import fixtures as fx  # noqa: E402
from capsbm25.build import build_index, load_postings  # noqa: E402
from capsbm25.config import BuildConfig  # noqa: E402

out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/fp_idx"

spark = (
    SparkSession.builder.master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

pdf = fx.gen_transcripts_pdf(250, 42)
cfg = BuildConfig(num_part_ids=48, shuffle_partitions=8, num_waves=3,
                  hot_share_threshold=0.004, max_salt_buckets=8)
res = build_index(spark, spark.createDataFrame(pdf), out, cfg)
p = load_postings(spark, out)
row = p.select(
    F.xxhash64(
        "term", "df", "cf", "doc_ids", "tfs", "dls", "part_id",
    ).alias("h"),
    # CONTENT fingerprint excludes part_id: the partition LAYOUT may
    # legitimately move when the plan-sampling source changes (it did in
    # round 3 when staged docs were removed), but the posting rows the
    # queries read must stay byte-identical across refactors.
    F.xxhash64(
        "term", "df", "cf", "doc_ids", "tfs", "dls",
    ).alias("hc"),
).agg(
    F.bit_xor("h").alias("fp"), F.bit_xor("hc").alias("fpc"),
    F.count("*").alias("n"),
).collect()[0]
print(f"FINGERPRINT {row['fp']} CONTENT {row['fpc']} ROWS {row['n']} "
      f"N {res.N} AVGDL {res.avgdl}")
spark.stop()
