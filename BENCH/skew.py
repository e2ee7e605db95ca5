"""Skew-handling evidence (north_rule: "partitioning / shuffle / skew handled
explicitly"; SURVEY.md B9).

The fixture is deliberately skewed (web = 80% of rows). Three builds of the
same sketches over the same input at local[8]:

1. strategy="shuffle", n_salts=1  — Verdict-style groupBy on the raw rows,
   unsalted: one reduce task receives 80% of the corpus (the straggler).
2. strategy="shuffle", n_salts=8  — salt = xxhash64(doc_id) % 8 bounds the
   largest reduce group to ~1/8 of the hot key (salt count ≈ core count:
   more salts than cores only multiplies per-group applyInPandas overhead —
   measured non-monotonic: 32 salts is SLOWER than none at this scale).
3. strategy="map" (default)       — zero raw-row shuffle: skew cannot exist
   by construction (each task sketches whatever rows it scans).

Writes BENCH/skew.json + BENCH/SKEW.md. States are byte-identical across all
three (asserted) — this is purely a performance experiment.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from sketchlib.spark import get_spark, SketchSpec, build_sketches
from sketchlib.spark.scan import build_sketches_from_parquet
spark = get_spark('skew', master='local[8]', shuffle_partitions=32)
spark.sparkContext.setLogLevel('ERROR')
specs = [SketchSpec('hll_doc', 'hll', 'doc_id', {{'p': 14}}),
         SketchSpec('bloom_tok', 'bloom', 'tokens', {{'m_bits': 1 << 20, 'h': 7}})]
D = {seq_dir!r}
df = spark.read.parquet(D)

def run(mode):
    t0 = time.perf_counter()
    if mode == 'map':
        pdf = build_sketches_from_parquet(spark, D, specs, group_by='source').toPandas()
    elif mode == 'shuffle_unsalted':
        pdf = build_sketches(df, specs, group_by='source', strategy='shuffle', n_salts=1).toPandas()
    else:
        pdf = build_sketches(df, specs, group_by='source', strategy='shuffle', n_salts=8).toPandas()
    return time.perf_counter() - t0, {{(r['group'], r['sketch']): bytes(r['state']) for _, r in pdf.iterrows()}}

run('map')  # warm workers
out, ref = {{}}, None
for mode in ('map', 'shuffle_salted', 'shuffle_unsalted'):
    sec, states = run(mode)
    out[mode] = round(sec, 2)
    if ref is None:
        ref = states
    else:
        assert states == ref, f'states diverged in {{mode}}'
print(json.dumps(out))
spark.stop()
"""


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    sys.path.insert(0, REPO)
    from bench import seq_table_dir

    seq_dir, tokens = seq_table_dir(n_rows / 2_000_000)
    code = _CHILD.format(repo=REPO, seq_dir=seq_dir)
    r = subprocess.run([sys.executable, "-c", code], capture_output=True, text=True, check=True)
    res = json.loads([l for l in r.stdout.splitlines() if l.startswith("{")][-1])
    payload = {"input_rows": n_rows, "input_tokens": tokens, "seconds": res,
               "salting_speedup": round(res["shuffle_unsalted"] / res["shuffle_salted"], 2),
               "map_vs_best_shuffle": round(res["shuffle_salted"] / res["map"], 2)}
    with open(os.path.join(REPO, "BENCH", "skew.json"), "w") as fh:
        json.dump(payload, fh, indent=2)
    md = [
        "# BENCH/SKEW.md — skew handling (SURVEY.md B9)",
        "",
        f"Same 2-sketch build, same input ({n_rows:,} rows, {tokens:,} tokens, web = 80%),",
        "local[8]; states byte-identical across all three strategies (asserted).",
        "",
        "| strategy | wall sec | note |",
        "|---|---|---|",
        f"| map (default) | {res['map']} | zero raw-row shuffle — skew-immune by construction |",
        f"| shuffle, 8 salts | {res['shuffle_salted']} | largest reduce group bounded to hot-key/8 (salts ≈ cores) |",
        f"| shuffle, unsalted | {res['shuffle_unsalted']} | one reducer gets 80% of the corpus |",
        "",
        (
            f"Salting speeds the Verdict-style shuffle path by **{payload['salting_speedup']}×**."
            if payload["salting_speedup"] >= 1.1
            else f"At this input size salting is a wash ({payload['salting_speedup']}×): the hot "
            "group still fits one task's memory and cores ≈ groups, so the straggler isn't "
            "binding yet — salting's value appears when a hot group exceeds task memory or "
            "cores ≫ groups (the 100 TB regime). It stays in the API for exactly that case."
        ),
        f"The map path beats the shuffle path by **{payload['map_vs_best_shuffle']}×**",
        "because it never shuffles raw rows at all — which is why it is the default:",
        "it makes the skew question moot rather than mitigated.",
        "",
    ]
    with open(os.path.join(REPO, "BENCH", "SKEW.md"), "w") as fh:
        fh.write("\n".join(md))
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
