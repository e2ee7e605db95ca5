"""Interleaved A/B of the headline queries at the sf1 PERF replica:
work (current tree) vs r6close (820d4e6) vs r5tip (4842bd2). Arm order
ROTATES each round so first-in-round host effects hit every arm equally."""
import json, os, subprocess, sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ARMS = [("work", REPO),
        ("r6close", os.path.join(REPO, ".bench_r6a")),
        ("r5tip", os.path.join(REPO, ".bench_sess6"))]
SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sketchlib_bench/sf1.0"
ROUNDS = int(sys.argv[2]) if len(sys.argv) > 2 else 3
OUT = os.environ.get("AB_OUT", os.path.join(REPO, "BENCH", "ab_sf1_probe.jsonl"))
for i in range(ROUNDS):
    order = ARMS[i % len(ARMS):] + ARMS[:i % len(ARMS)]
    for arm, tree in order:
        env = dict(os.environ, PYTHONPATH=tree)
        p = subprocess.run([sys.executable, os.path.join(tree, "BENCH", "headline_sf.py"), SF_DIR, "2"],
                           cwd=tree, env=env, capture_output=True, text=True, timeout=1800)
        line = next((ln for ln in reversed(p.stdout.splitlines()) if ln.startswith("{")), None)
        rec = {"arm": arm, "i": i}
        if p.returncode != 0 or line is None:
            rec["error"] = (p.stderr or p.stdout)[-1500:]
        else:
            d = json.loads(line)
            rec["best"] = d["best"]; rec["total"] = d["total_best"]
        with open(OUT, "a") as fh:
            fh.write(json.dumps(rec) + "\n")
        print(json.dumps({k: rec.get(k) for k in ("arm", "i", "total", "error")}), flush=True)
