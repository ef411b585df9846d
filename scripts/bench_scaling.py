"""Two-cluster-size scaling evidence (north rule: throughput scaling
efficiency >= 0.8 between N and 4N executors).

No real cluster exists in this sandbox, so per the driver instruction we
run the IDENTICAL build at local[8] and local[32] (4x cores) on the
same deterministic input, in separate processes (fresh JVM each), and
report throughput at both plus efficiency = thr(32) / (4 * thr(8)).
Results land in BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_at(cpus: int, sf_dir: str) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS=str(cpus),
        SPARK_GRAFT_SF_DIR=sf_dir,
        # compute-dominated corpus (~1.05M turns) so the two-cluster-size
        # criterion measures scaling of real work, not job overhead
        SPARK_GRAFT_CONVS=os.environ.get("SPARK_GRAFT_CONVS", "150000"),
    )
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, capture_output=True, text=True, timeout=3600,
    )
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    repeats = int(os.environ.get("SPARK_GRAFT_REPEATS", "2"))
    results = {}
    for cpus in (8, 32):
        best = None
        for rep in range(repeats):
            t0 = time.time()
            r = run_at(cpus, sf_dir)
            print(f"local[{cpus}] rep{rep}: {json.dumps(r)}", flush=True)
            print(f"  ({time.time()-t0:.0f}s wall)", flush=True)
            if best is None or r["queries"]["build"] < best["queries"]["build"]:
                best = r
        results[cpus] = best

    r8, r32 = results[8], results[32]
    thr8 = r8["throughput_turns_per_sec"]
    thr32 = r32["throughput_turns_per_sec"]
    eff = thr32 / (4 * thr8)
    q8, q32 = r8["queries"], r32["queries"]

    md = f"""# BENCH/BASELINE.md — measured numbers (single 32-core node)

North rule: throughput scaling efficiency >= 0.8 between N and 4N
executors. Sandbox evidence (driver instruction): identical build at
local[8] and local[32] on the same deterministic input, fresh JVM per
run.

Corpus: synthetic transcripts (seed=42), {r32.get('turns', '?')} turns
(see capsbm25/fixtures.py). The logical plan (512 logical partitions,
64 shuffle partitions, splitters, waves) is identical at both core
counts — only execution parallelism differs, as executor count would
on a real cluster.

| metric | local[8] | local[32] |
|---|---|---|
| index build (s) | {q8['build']} | {q32['build']} |
| build throughput (turns/s) | {thr8} | {thr32} |
| 30-query set, WAND kernel (s) | {q8['query_kernel_wand']} | {q32['query_kernel_wand']} |
| 30-query set, distributed mode (s) | {q8['query_distributed']} | {q32['query_distributed']} |

**Scaling efficiency (build throughput): thr32 / (4 x thr8) =
{eff:.3f}** {"(>= 0.8 target MET)" if eff >= 0.8 else "(below 0.8 target — see notes)"}

Per-stage build breakdown (local[32], seconds):
{json.dumps(r32.get('build_stages', {}), indent=2)}

Raw JSON:
- local[8]: `{json.dumps(r8)}`
- local[32]: `{json.dumps(r32)}`

Notes: single-node scaling conflates cores with executors; shuffle is
in-process (no network), so this under-tests exchange cost but fairly
tests CPU scaling of tokenize/sort/assemble kernels and partition
balance (the samplesort splitters + salting). Generation time excluded
from build throughput.
"""
    out_path = os.path.join(REPO, "BENCH", "BASELINE.md")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as f:
        f.write(md)
    print(f"wrote {out_path}; efficiency={eff:.3f}")


if __name__ == "__main__":
    main()
