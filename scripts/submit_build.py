"""spark-submit entry point for the index build (north-rule launch mode).

Usage (cluster):
  cd <repo> && zip -r /tmp/capsbm25.zip capsbm25
  spark-submit --py-files /tmp/capsbm25.zip scripts/submit_build.py \\
      --input  <transcripts parquet/iceberg path-or-table> \\
      --output <index dir> [--resume] [--num-part-ids 8192] \\
      [--shuffle-partitions 2048] [--waves 16]

Local smoke:
  spark-submit --master 'local[8]' --py-files /tmp/capsbm25.zip \\
      scripts/submit_build.py --input /tmp/t.parquet --output /tmp/idx

The SparkSession is taken from the environment (spark-submit provides
master/executor config), so the same script runs on any cluster size —
the N-vs-4N scaling criterion varies only --num-executors.
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True,
                    help="transcripts parquet path or catalog table name")
    ap.add_argument("--output", required=True, help="index output directory")
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--num-part-ids", type=int, default=8192,
                    help="logical partitions (reference default p=8192)")
    ap.add_argument("--shuffle-partitions", type=int, default=None)
    ap.add_argument("--waves", type=int, default=16)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from capsbm25.build import build_index
    from capsbm25.config import BuildConfig

    spark = SparkSession.builder.appName("capsbm25-build").getOrCreate()
    shuffle = args.shuffle_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions", "200")
    )
    cfg = BuildConfig(
        num_part_ids=args.num_part_ids,
        shuffle_partitions=shuffle,
        num_waves=args.waves,
    )
    if "/" in args.input or args.input.endswith(".parquet"):
        transcripts = spark.read.parquet(args.input)
    else:
        transcripts = spark.read.table(args.input)

    res = build_index(spark, transcripts, args.output, cfg, resume=args.resume)
    print(json.dumps({
        "N": res.N,
        "avgdl": res.avgdl,
        "hot_terms": len(res.plan.hot_terms),
        "metrics": res.metrics,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
