"""Interleaved sf0.1 bench A/B: HEAD (fused doc-stats emission) vs the
pre-change commit, pinned worktrees, alternating reps — the round's
standard noise-robust comparison protocol.
Usage: python scripts/ab_fusedstats_sf01.py <old_sha> [n_pairs]
"""
import os
import subprocess
import sys
import tempfile

REPO = "/root/repo"
OLD = sys.argv[1]
PAIRS = int(sys.argv[2]) if len(sys.argv) > 2 else 3
LOG = os.environ.get("AB_LOG", "/root/repo/BENCH/r08/ab_fusedstats_sf01.log")

wt = tempfile.mkdtemp(prefix="ab_old_")
subprocess.run(["git", "-C", REPO, "worktree", "add", "--detach",
                wt + "/tree", OLD], check=True)
trees = {"old": wt + "/tree", "new": REPO}

with open(LOG, "a") as log:
    for rep in range(1, PAIRS + 1):
        for name in ("old", "new"):
            tree = trees[name]
            env = dict(os.environ, PYTHONPATH=tree,
                       SPARK_GRAFT_SF_DIR="/root/testdata/sf0.1",
                       SPARK_GRAFT_CPUS="32")
            r = subprocess.run(
                [sys.executable, os.path.join(tree, "bench.py")],
                cwd=tree, env=env, capture_output=True, text=True)
            line = [ln for ln in r.stdout.splitlines()
                    if ln.startswith('{"metric"')]
            out = line[-1] if line else f"FAILED rc={r.returncode}"
            print(f"rep{rep} {name} {out}", flush=True)
            log.write(f"rep{rep} {name} {out}\n")
            log.flush()

subprocess.run(["git", "-C", REPO, "worktree", "remove", "--force",
                wt + "/tree"], check=False)
