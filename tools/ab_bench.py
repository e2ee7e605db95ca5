"""Interleaved A/B benchmark: HEAD vs the round-2 tree (VERDICT r3 item #1).

Runs each tree's own bench.py alternately N times (A B A B ...), so host-load
drift hits both arms equally, and appends one JSON line per run to
BENCH/ab_r4.jsonl: {"arm": "head"|"r2", "i": n, "queries": {...}, "value": s}.

Both arms share the /tmp sequences-table cache (same input bytes) and run with
SPARK_GRAFT_SCALE2=0 on the HEAD arm (r2's bench.py has no extra blocks).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

ROUNDS = int(sys.argv[1]) if len(sys.argv) > 1 else 5
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ARMS = [("head", REPO), ("r2", os.path.join(REPO, ".bench_r2"))]
OUT = os.path.join(REPO, "BENCH", "ab_r4.jsonl")


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
