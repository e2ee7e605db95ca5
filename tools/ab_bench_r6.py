"""Interleaved A/B benchmark for round 6: HEAD vs the round-5 tip
(.bench_sess6 worktree of commit 4842bd2). Runs each tree's own bench.py
alternately (A B A B ...) so host-load drift — large on this shared box —
hits both arms equally; appends one JSON line per run to BENCH/ab_r6.jsonl.
Both arms share the /tmp sequences-table cache and run SPARK_GRAFT_SCALE2=0
(headline + build only)."""

from __future__ import annotations

import json
import os
import subprocess
import sys

ROUNDS = int(sys.argv[1]) if len(sys.argv) > 1 else 5
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ARMS = [("head", REPO), ("r5", os.path.join(REPO, ".bench_sess6"))]
OUT = os.environ.get(
    "AB_R6_OUT", os.path.join(REPO, "BENCH", "ab_r6.jsonl")
)


def run_one(arm: str, tree: str, i: int) -> dict:
    env = dict(os.environ, SPARK_GRAFT_SCALE2="0", PYTHONPATH=tree)
    p = subprocess.run(
        [sys.executable, os.path.join(tree, "bench.py")],
        cwd=tree, env=env, capture_output=True, text=True, timeout=1800,
    )
    line = next(
        (ln for ln in reversed(p.stdout.splitlines()) if ln.startswith("{")), None
    )
    rec = {"arm": arm, "i": i}
    if p.returncode != 0 or line is None:
        rec["error"] = (p.stderr or p.stdout)[-2000:]
    else:
        d = json.loads(line)
        rec["value"] = d["value"]
        rec["queries"] = d["queries"]
    return rec


def main() -> None:
    for i in range(ROUNDS):
        for arm, tree in ARMS:
            rec = run_one(arm, tree, i)
            with open(OUT, "a") as fh:
                fh.write(json.dumps(rec) + "\n")
            print(json.dumps({k: rec.get(k) for k in ("arm", "i", "value", "error")}))


if __name__ == "__main__":
    main()
