"""Job-level decomposition of the cold documents-table index builds
(phrase_documents / substring_documents bench stages) via the Spark
event log: per-job wall, call site, task count — identifies which of
the ~29 fixed jobs carry the 3.2s cold-build wall at 5k rows.
Usage: python scripts/profile_docs_builds_r8.py [sf_dir]"""

import glob
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

from pyspark.sql import SparkSession

import __spark_entry__ as E

evdir = tempfile.mkdtemp(prefix="capsbm25_evlog_")
spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "64")
    .config("spark.ui.enabled", "false")
    .config("spark.eventLog.enabled", "true")
    .config("spark.eventLog.dir", evdir)
    .config("spark.eventLog.compress", "false")
    .config("spark.eventLog.rolling.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

marks = []


def run(label, fn):
    t0 = time.time()
    fn()
    t1 = time.time()
    marks.append((label, t0 * 1000, t1 * 1000, t1 - t0))


run("warmup", lambda: spark.range(1000).selectExpr("sum(id)").collect())
run("phrase_cold", lambda: E.q_phrase_topk(spark, SF).collect())
run("phrase_warm", lambda: E.q_phrase_topk(spark, SF).collect())
run("substring_cold", lambda: E.q_substring_topk(spark, SF).collect())
run("substring_warm", lambda: E.q_substring_topk(spark, SF).collect())
run("near_warm", lambda: E.q_near_topk(spark, SF).collect())
spark.stop()

log = sorted(glob.glob(os.path.join(evdir, "*")))[-1]
if os.path.isdir(log):  # rolling event log (v2) writes a directory
    log = sorted(glob.glob(os.path.join(log, "events_*")))[-1]
jobs = {}
with open(log) as f:
    for line in f:
        ev = json.loads(line)
        e = ev.get("Event")
        if e == "SparkListenerJobStart":
            jid = ev["Job ID"]
            props = ev.get("Properties") or {}
            jobs[jid] = {
                "start": ev["Submission Time"],
                "site": props.get("callSite.short", ""),
                "desc": props.get("spark.job.description", ""),
                "ntasks": sum(
                    s.get("Number of Tasks", 0)
                    for s in ev.get("Stage Infos", [])
                ),
                "stages": [
                    f"{s.get('Stage Name','')}[{s.get('Number of Tasks',0)}]"
                    for s in ev.get("Stage Infos", [])
                ],
            }
        elif e == "SparkListenerJobEnd":
            if ev["Job ID"] in jobs:
                jobs[ev["Job ID"]]["end"] = ev["Completion Time"]

for label, m0, m1, wall in marks:
    sel = [(jid, j) for jid, j in jobs.items()
           if "end" in j and j["start"] >= m0 - 50 and j["start"] <= m1]
    tot = sum(j["end"] - j["start"] for _, j in sel) / 1000
    print(f"== {label}: wall={wall:.2f}s jobs={len(sel)} "
          f"sum_job_wall={tot:.2f}s")
    for jid, j in sorted(sel):
        d = (j["end"] - j["start"]) / 1000
        name = j["desc"] or j["site"]
        st = " | ".join(j.get("stages", []))
        print(f"  j{jid:<3} {d:6.3f}s tasks={j['ntasks']:<3} {name[:60]}"
              f"  :: {st[:160]}")
