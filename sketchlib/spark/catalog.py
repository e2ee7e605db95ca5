"""Sketch-state catalog — Verdict's sample lifecycle, re-expressed (SURVEY.md
A2 `CREATE SAMPLE`, A3 `SHOW/DROP SAMPLES`, A5 approx scan).

Verdict persists derived sample tables plus metadata in a `verdict`-owned
schema; the analog here is a directory of persisted state tables plus a
`_sketch_catalog` parquet table mapping (name) → (source table, group_by,
specs, build stats). Queries then hit the states (KBs) instead of the corpus
— the A5 "scan the sample instead of the base table" move.

Layout under ``root``::

    _sketch_catalog/            one parquet row per registered sketch set
    states/<name>/              merged state table (STATE_FIELDS schema)
"""

from __future__ import annotations

import json
import os
import shutil
import time

from pyspark.sql import DataFrame, SparkSession

from sketchlib.spark.build import SketchSpec
from sketchlib.spark.scan import build_sketches_from_parquet

_CATALOG_SCHEMA = (
    "name string, input_dir string, group_by string, specs_json string, "
    "n_states long, rows long, tokens long, built_unix double, files_json string"
)


def _ddl_pa_schema(ddl: str):
    """pyarrow twin of a registry DDL schema string — registry appends are
    one-row writes, so they go through pyarrow driver-side (a local file
    create) instead of a Spark write job; Spark reads the mixed directory
    identically."""
    import pyarrow as pa

    types = {"string": pa.string(), "long": pa.int64(),
             "double": pa.float64(), "int": pa.int32()}
    fields = []
    for part in ddl.split(","):
        n, t = part.strip().split()
        fields.append((n, types[t]))
    return pa.schema(fields)


def _dir_num_rows(d: str) -> int:
    """Total rows of a local parquet dir from footers alone (no Spark job)."""
    import glob as _glob

    import pyarrow.parquet as pq

    return sum(
        pq.read_metadata(f).num_rows
        for f in _glob.glob(os.path.join(d, "**", "*.parquet"), recursive=True)
    )

_SAMPLE_SCHEMA = (
    "name string, input_dir string, kind string, ratio double, on_col string, "
    "seed long, rows_sampled long, built_unix double, fractions_json string, "
    "files_json string"
)

_ANN_SCHEMA = (
    "name string, input_dir string, kind string, vec_col string, id_col string, "
    "n_bits int, seed long, n_lists int, centroids_json string, rows long, built_unix double, "
    "files_json string"
)

_SIG_SCHEMA = (
    "name string, input_dir string, tokens_col string, id_col string, "
    "r int, n_bands int, seed long, rows long, built_unix double, files_json string"
)


class SketchCatalog:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        # collected-rows cache for the (KB-sized) registry logs, keyed by
        # the log dir's file LISTING fingerprint: the logs are append-only
        # (every register/drop/refresh writes a new parquet file), so any
        # mutation — by this instance, another instance, or another
        # process — changes the listing and invalidates the entry. Repeat
        # routing/meta lookups then cost a scandir instead of a Spark job
        # (~0.5 s of per-statement constant, measured in
        # BENCH/contract_bench.json).
        self._rows_cache: dict = {}
        os.makedirs(os.path.join(root, "_sketch_catalog"), exist_ok=True)
        os.makedirs(os.path.join(root, "states"), exist_ok=True)
        os.makedirs(os.path.join(root, "_sample_catalog"), exist_ok=True)
        os.makedirs(os.path.join(root, "samples"), exist_ok=True)
        os.makedirs(os.path.join(root, "_ann_catalog"), exist_ok=True)
        os.makedirs(os.path.join(root, "ann"), exist_ok=True)
        os.makedirs(os.path.join(root, "_sig_catalog"), exist_ok=True)
        os.makedirs(os.path.join(root, "signatures"), exist_ok=True)

    def _append_registry_row(self, registry: str, ddl: str, row: tuple) -> None:
        """Append ONE registration row to a registry log driver-side
        (pyarrow write — no Spark job for a ≤12-field row; measured ~0.2 s
        of per-registration fixed cost). Unique filename keyed on
        (time_ns, pid) keeps concurrent appenders from colliding; the
        append changes the dir listing, which invalidates _rows_cache."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        schema = _ddl_pa_schema(ddl)
        table = pa.Table.from_pylist(
            [dict(zip([f.name for f in schema], row))], schema=schema
        )
        out = os.path.join(
            self.root, registry,
            f"part-local-{time.time_ns()}-{os.getpid()}.parquet",
        )
        pq.write_table(table, out)

    @staticmethod
    def _states_stats_local(sdir: str) -> tuple[int, int, int]:
        """(n_state_rows, sum(rows), sum(tokens)) of a persisted state table,
        read driver-side with pyarrow — the table is KB-to-MB scale (one row
        per group × sketch), so a Spark aggregate job is pure overhead."""
        import pyarrow.parquet as pq

        t = pq.read_table(sdir, columns=["rows", "tokens"])
        import pyarrow.compute as pc

        return (
            t.num_rows,
            int(pc.sum(t["rows"]).as_py() or 0),
            int(pc.sum(t["tokens"]).as_py() or 0),
        )

    # --- A2: CREATE SAMPLE analog -----------------------------------------
    def create(
        self,
        name: str,
        input_dir: str,
        specs: list[SketchSpec],
        group_by: str | None = "source",
        overwrite: bool = False,
    ) -> DataFrame:
        """Build, persist, and register a sketch set; returns the state table."""
        if self.exists(name):
            if not overwrite:
                raise ValueError(f"sketch set {name!r} already exists (use overwrite=True)")
            self.drop(name)
        # plan the file list ONCE and build exactly those files, so the
        # registered lineage matches what the states cover even if files
        # land in input_dir mid-build (refresh() picks them up later)
        from sketchlib.spark.scan import plan_chunks

        files = sorted({c.file for c in plan_chunks(input_dir)})
        states = build_sketches_from_parquet(
            self.spark, input_dir, specs, group_by=group_by, files=files
        )
        # record the sketched columns' INPUT types (a footer read, no job):
        # set-operation answers merge sketches ACROSS registrations, and the
        # kernel hashes int/float/string values differently — the resolver
        # must be able to refuse a cross-type merge (silently wrong counts)
        try:
            schema = self.spark.read.parquet(input_dir).schema
            dtypes = {f.name: f.dataType.simpleString() for f in schema.fields}
        except Exception:
            dtypes = None
        return self._persist_set(
            name, states, specs, group_by, input_dir, json.dumps(files), dtypes
        )

    def _persist_set(
        self, name: str, states: DataFrame, specs, group_by, input_dir: str,
        files_json, dtypes: dict | None = None,
    ) -> DataFrame:
        """Shared persist-and-register tail for sketch sets (create /
        register_states): snapshot to states/<name>; stats and the
        registration row are driver-side pyarrow reads/writes (no Spark jobs)."""
        sdir = os.path.join(self.root, "states", name)
        states.write.mode("overwrite").parquet(sdir)
        persisted = self.spark.read.parquet(sdir)
        # stats from the just-written KB/MB-scale state table, driver-side —
        # the old Spark agg job re-read it for three scalars
        n_rows, r_sum, t_sum = self._states_stats_local(sdir)
        canon_group = (
            ",".join(group_by) if isinstance(group_by, (list, tuple)) else (group_by or "")
        )
        n_specs = max(len(specs), 1)
        self._append_registry_row(
            "_sketch_catalog", _CATALOG_SCHEMA,
            (
                name,
                input_dir,
                canon_group,
                json.dumps(
                    [
                        {
                            "name": s.name, "kind": s.kind, "column": s.column,
                            "params": s.params, "weight": s.weight,
                            # input types (None when unknowable, e.g. stream
                            # states): lets cross-registration merges refuse
                            # hash-incompatible columns instead of silently
                            # comparing unrelated hashes
                            "dtype": (dtypes or {}).get(s.column),
                            "group_dtype": (dtypes or {}).get(canon_group) if canon_group else None,
                        }
                        for s in specs
                    ]
                ),
                n_rows,
                r_sum // n_specs,
                t_sum // n_specs,
                time.time(),
                files_json,
            )
        )
        return persisted

    def register_states(
        self,
        name: str,
        states: DataFrame,
        specs: list[SketchSpec],
        group_by: str | list[str] | None = "source",
        input_dir: str = "",
        overwrite: bool = False,
    ) -> DataFrame:
        """Register EXTERNALLY BUILT states — e.g. a StreamingSketchSink's
        current table — as a queryable sketch set: snapshot into the
        catalog with a registration row, so ``approx_sql`` answers from
        states a STREAM maintains (Verdict-over-streams; the reference is
        batch-only). The snapshot is immutable while the stream advances;
        re-register (overwrite=True) to publish a fresher one. No file
        lineage is recorded (streams have none), so ``refresh()`` on such a
        set raises — re-registration IS its refresh."""
        if self.exists(name):
            if not overwrite:
                raise ValueError(f"sketch set {name!r} already exists (use overwrite=True)")
            self.drop(name)
        # files_json None: no lineage for externally built states —
        # refresh() refuses and points back at re-registration. When a real
        # input_dir is given, record the sketched columns' types like
        # create() does (cross-registration merges refuse unknown dtypes);
        # stream registrations without one stay typeless and simply never
        # serve cross-table merge routes.
        dtypes = None
        if input_dir:
            try:
                schema = self.spark.read.parquet(input_dir).schema
                dtypes = {f.name: f.dataType.simpleString() for f in schema.fields}
            except Exception:
                dtypes = None
        return self._persist_set(name, states, specs, group_by, input_dir, None, dtypes)

    _LOCAL_REFRESH_BYTES = 256 << 20

    def _local_refresh_merge(self, sdir: str, newpart: DataFrame, specs, reg, new_files):
        """Driver-local refresh merge, or None to use the Spark pipeline.

        A refresh moves KB/MB-scale state rows through a full Exchange +
        applyInPandas stage + a Spark write just to fold a handful of delta
        partials into the persisted table — ~4 fixed job costs for work the
        driver does in milliseconds. When the ESTIMATED volume (persisted
        table size + delta-task count × groups × per-spec state size, all
        known driver-side) fits the byte budget, collect the delta partials
        (one job: the kernel), read the old table with pyarrow, and merge
        in exactly ``_merge_pdf``'s canonical (part_id, state bytes) order
        — byte-identical states to the pipeline path (old rows carry
        part_id=-1, so they sort first either way). Cluster-scale state
        tables overflow the estimate and keep the distributed merge."""
        import pyarrow as pa

        from sketchlib.sketches import deserialize
        from sketchlib.spark.build import _ARROW_STATE_SCHEMA

        try:
            old_bytes = sum(
                os.path.getsize(os.path.join(r, f))
                for r, _, fs in os.walk(sdir)
                for f in fs
            )
            n_specs = max(len(specs), 1)
            n_groups = max(int(reg["n_states"]) // n_specs, 1)
            per_set = sum(s.make().max_state_bytes() for s in specs)
            delta_chunks = sum(
                max(1, os.path.getsize(f) // (8 << 20)) for f in new_files
            )
            n_tasks = min(delta_chunks, self.spark.sparkContext.defaultParallelism)
            est = old_bytes + n_tasks * n_groups * per_set
        except Exception:
            return None
        if est > self._LOCAL_REFRESH_BYTES:
            return None

        delta_rows = newpart.collect()  # ONE job: the delta sketch kernel
        import pyarrow.parquet as pq

        old = pq.read_table(sdir).to_pylist()
        by_key: dict = {}
        for r in old:
            by_key.setdefault((r["group"], r["sketch"]), []).append(r)
        for r in delta_rows:
            d = r.asDict()
            d["state"] = bytes(d["state"])
            by_key.setdefault((d["group"], d["sketch"]), []).append(d)
        out = []
        for (g, name_), rs in sorted(by_key.items()):
            rs.sort(key=lambda r: (r["part_id"], bytes(r["state"])))
            acc = deserialize(rs[0]["state"])
            for r in rs[1:]:
                acc.merge(deserialize(r["state"]))
            out.append(
                {
                    "group": g,
                    "sketch": name_,
                    "kind": rs[0]["kind"],
                    "state": acc.to_bytes(),
                    "n_items": int(acc.n_items),
                    "part_id": -1,
                    "rows": int(sum(r["rows"] for r in rs)),
                    "tokens": int(sum(r["tokens"] for r in rs)),
                    "wall_ms": float(sum(r["wall_ms"] for r in rs)),
                }
            )
        return pa.Table.from_pylist(out, schema=_ARROW_STATE_SCHEMA)

    def refresh(self, name: str) -> dict:
        """Incremental maintenance on APPEND — Verdict keeps its scrambles
        fresh as base tables grow; mergeable sketches make the analog EXACT:
        sketch ONLY the parquet files added to the input dir since the last
        build/refresh and merge their partial states into the persisted
        state table. At 100 TB this is the difference between touching the
        day's append and re-scanning the corpus.

        Append-only contract: every previously covered file must still
        exist (sketch states cannot subtract) — a covered file gone from
        the input dir raises; rebuild with ``create(overwrite=True)``.
        Returns {new_files, rows_added, tokens_added}."""
        from sketchlib.spark.build import merge_states
        from sketchlib.spark.scan import partial_states_from_parquet, plan_chunks

        reg = self._registry_meta("_sketch_catalog", _CATALOG_SCHEMA, name, "sketch set")
        if reg["files_json"] is None:
            raise ValueError(
                f"sketch set {name!r} has no file lineage — if it came from "
                "register_states (e.g. a streaming sink), re-register a fresh "
                "snapshot (that IS its refresh); a file-backed set built "
                "before lineage existed needs one create(overwrite=True)"
            )
        new, current = self._lineage_new_files(
            reg, "sketch state", "rebuild with create(overwrite=True)"
        )
        if not new:
            return {"new_files": 0, "rows_added": 0, "tokens_added": 0}

        specs = [
            SketchSpec(s["name"], s["kind"], s["column"], s["params"],
                       weight=s.get("weight"))
            for s in json.loads(reg["specs_json"])
        ]
        gb = reg["group_by"] or None
        if gb and "," in gb:
            gb = gb.split(",")
        newpart = partial_states_from_parquet(
            self.spark, reg["input_dir"], specs, group_by=gb, files=new
        )
        # prior totals come from the registration row — no extra Spark job
        before_rows, before_tokens = int(reg["rows"]), int(reg["tokens"])
        sdir = os.path.join(self.root, "states", name)
        tmp, bak = sdir + "._refresh_tmp", sdir + "._refresh_old"
        # a stale backup from a crashed refresh would wedge the rename
        shutil.rmtree(bak, ignore_errors=True)
        local = self._local_refresh_merge(sdir, newpart, specs, reg, new)
        if local is not None:
            import pyarrow.parquet as pq

            shutil.rmtree(tmp, ignore_errors=True)
            os.makedirs(tmp)
            pq.write_table(local, os.path.join(tmp, "part-00000.parquet"))
        else:
            refreshed = merge_states(self.states(name).unionByName(newpart))
            refreshed.write.mode("overwrite").parquet(tmp)
        os.rename(sdir, bak)
        try:
            os.rename(tmp, sdir)
        except OSError:
            # a concurrent reader's crash-restore (_restore_crashed) can
            # rename the backup into place between our two renames; the
            # restored content IS the pre-refresh states, which the tmp
            # table supersedes. Re-establish the sdir-OR-bak invariant
            # FIRST (rename the restored copy back to the backup name —
            # never an unprotected rmtree of the only live copy: a crash
            # right after that rmtree would leave nothing a restore scan
            # recognizes), then finish the swap
            if os.path.isdir(sdir):
                shutil.rmtree(bak, ignore_errors=True)
                os.rename(sdir, bak)
                os.rename(tmp, sdir)
            else:
                raise
        shutil.rmtree(bak, ignore_errors=True)
        # stats + registration row driver-side (KB/MB-scale reads, no jobs)
        n_rows, r_sum, t_sum = self._states_stats_local(sdir)
        n_specs = max(len(specs), 1)
        rows_total = r_sum // n_specs
        tokens_total = t_sum // n_specs
        self._append_registry_row(
            "_sketch_catalog", _CATALOG_SCHEMA,
            (
                name,
                reg["input_dir"],
                reg["group_by"],
                reg["specs_json"],
                n_rows,
                rows_total,
                tokens_total,
                time.time(),
                json.dumps(sorted(current)),
            )
        )
        return {
            "new_files": len(new),
            "rows_added": rows_total - before_rows,
            "tokens_added": tokens_total - before_tokens,
        }


    # --- shared registry machinery (append-only parquet log per registry) ---

    def _lineage_new_files(self, reg, kind_label: str, rebuild_hint: str):
        """(new_files_sorted, current_set) from a registration row's file
        lineage — the refresh preamble all four registries share: rows
        registered without lineage refuse refresh, and every covered file
        must still exist (sketch states / samples / indexes / signatures
        cannot subtract). Raises with the registry's own rebuild hint."""
        from sketchlib.spark.scan import plan_chunks

        if reg["files_json"] is None:
            raise ValueError(
                f"{kind_label} {reg['name']!r} has no file lineage — {rebuild_hint}"
            )
        covered = set(json.loads(reg["files_json"]))
        current = {c.file for c in plan_chunks(reg["input_dir"])}
        gone = sorted(covered - current)
        if gone:
            raise ValueError(
                f"{len(gone)} covered file(s) no longer in {reg['input_dir']!r} "
                f"(e.g. {gone[0]!r}) — {kind_label}s cannot subtract; {rebuild_hint}"
            )
        return sorted(current - covered), current

    def _restore_crashed(self, live_dir: str) -> None:
        """Restore any '<name>._refresh_old' left by a crash between
        refresh()'s two renames back to '<name>' — run wherever the live
        set is ENUMERATED (listing, auto-selection), not just in exists():
        a wedged set must not silently vanish from SHOW/routing until some
        code path happens to probe it by name."""
        d = os.path.join(self.root, live_dir)
        for entry in os.listdir(d):
            if entry.endswith("._refresh_old"):
                name = entry[: -len("._refresh_old")]
                if not os.path.isdir(os.path.join(d, name)):
                    try:
                        os.rename(os.path.join(d, entry), os.path.join(d, name))
                    except OSError:
                        # lost the race to a refresh() completing its swap
                        # between our isdir check and the rename — the live
                        # dir exists now and the backup is the writer's to
                        # clean up; anything else is a real error
                        if not os.path.isdir(os.path.join(d, name)):
                            raise

    def _registry_live(self, cat_dir: str, schema: str, live_dir: str) -> "DataFrame":
        """Newest registration row per LIVE name: the log is append-only
        (drops leave stale rows, overwrite leaves both registrations), so
        keep only the max-built_unix row per name that still has data on
        disk — shared by all three registries (sketch sets, samples, ANN)."""
        from pyspark.sql import Window, functions as F

        df = self.spark.read.schema(schema).parquet(os.path.join(self.root, cat_dir))
        self._restore_crashed(live_dir)
        live = sorted(
            e for e in os.listdir(os.path.join(self.root, live_dir))
            if not e.endswith("._refresh_old") and not e.endswith("._refresh_tmp")
        )
        # broadcast-join the live names rather than isin(): a 10⁴-entry
        # registry turned the In() literal list into multi-second Catalyst
        # planning per statement (measured 6 s); the join keeps listing and
        # auto-selection sub-second at that scale
        live_df = self.spark.createDataFrame([(n,) for n in live], "name string")
        w = Window.partitionBy("name").orderBy(F.desc("built_unix"))
        return (
            df.join(F.broadcast(live_df), "name", "inner")
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )

    def _dir_fingerprint(self, rel_dir: str):
        """(name, size, mtime_ns) of every direct entry of ``rel_dir`` —
        the cache key: any registry append/drop/refresh creates or removes
        files here, whoever performs it."""
        p = os.path.join(self.root, rel_dir)
        try:
            with os.scandir(p) as it:
                return tuple(
                    sorted((e.name, e.stat().st_size, e.stat().st_mtime_ns) for e in it)
                )
        except FileNotFoundError:
            return None

    def _log_rows(self, cat_dir: str, schema: str) -> list:
        """ALL registration rows of one registry log (collected), served
        from the listing-keyed cache. The logs are KBs — a handful of rows
        per registered artifact — so holding them driver-side is free; the
        win is skipping a Spark read+collect (~0.5 s) per routing lookup."""
        fp = self._dir_fingerprint(cat_dir)
        hit = self._rows_cache.get(cat_dir)
        if hit is not None and hit[0] == fp:
            return hit[1]
        rows = self.spark.read.schema(schema).parquet(
            os.path.join(self.root, cat_dir)
        ).collect()
        self._rows_cache[cat_dir] = (fp, rows)
        return rows

    def _live_rows(self, cat_dir: str, schema: str, live_dir: str) -> list:
        """Collected _registry_live result (newest registration row per
        LIVE name) computed driver-side from the cached log rows — the
        hot-path twin of _registry_live (equivalence test-locked), used by
        statement routing where the per-call Spark job was the latency."""
        self._restore_crashed(live_dir)
        live = {
            e for e in os.listdir(os.path.join(self.root, live_dir))
            if not e.endswith("._refresh_old") and not e.endswith("._refresh_tmp")
        }
        newest: dict = {}
        for r in self._log_rows(cat_dir, schema):
            if r["name"] not in live:
                continue
            cur = newest.get(r["name"])
            if cur is None or r["built_unix"] > cur["built_unix"]:
                newest[r["name"]] = r
        return sorted(newest.values(), key=lambda r: r["name"])

    def _registry_meta(self, cat_dir: str, schema: str, name: str, kind_label: str):
        rows = [r for r in self._log_rows(cat_dir, schema) if r["name"] == name]
        if not rows:
            raise ValueError(f"unknown {kind_label} {name!r}")
        return max(rows, key=lambda r: r["built_unix"])

    # --- A3: SHOW SAMPLES analog -------------------------------------------
    def list(self) -> DataFrame:
        return self._registry_live("_sketch_catalog", _CATALOG_SCHEMA, "states")

    def list_rows(self) -> list:
        """``list().collect()`` without the per-call Spark job — served
        from the listing-keyed cache; the statement-routing hot path."""
        return self._live_rows("_sketch_catalog", _CATALOG_SCHEMA, "states")

    def list_sample_rows(self) -> list:
        """``list_samples().collect()`` — same cache-served hot path."""
        return self._live_rows("_sample_catalog", _SAMPLE_SCHEMA, "samples")

    def exists(self, name: str) -> bool:
        sdir = os.path.join(self.root, "states", name)
        bak = sdir + "._refresh_old"
        if not os.path.isdir(sdir) and os.path.isdir(bak):
            # crash landed between refresh()'s two renames — restore the
            # pre-refresh states (refresh is then simply re-run)
            os.rename(bak, sdir)
        return os.path.isdir(sdir)

    # --- A5: approx scan — read states instead of the base table ----------
    def states(self, name: str) -> DataFrame:
        if not self.exists(name):
            raise ValueError(f"unknown sketch set {name!r}")
        return self.spark.read.parquet(os.path.join(self.root, "states", name))

    # --- A3: DROP SAMPLE analog --------------------------------------------
    def drop(self, name: str) -> None:
        sdir = os.path.join(self.root, "states", name)
        if os.path.isdir(sdir):
            shutil.rmtree(sdir)

    # --- A2 literal: persisted SAMPLE tables (Verdict scrambles) ------------
    # Sketch states serve the fixed estimator set; a persisted row sample
    # serves ARBITRARY aggregates with HT scale-up — Verdict's actual
    # product. Both live side by side in the catalog.

    def create_sample(
        self,
        name: str,
        input_dir: str,
        kind: str = "uniform",
        ratio: float = 0.1,
        on: str | None = None,
        fractions: dict | None = None,
        seed: int = 42,
        overwrite: bool = False,
    ) -> DataFrame:
        """Persist a uniform (Bernoulli-p rows), universe (hash(on) < p
        domain), or stratified (per-group fractions, ``on`` = group column)
        sample table; queries then scan the fraction instead of the corpus
        (A5). Returns the persisted sample."""
        from sketchlib.spark.sampling import stratified_sample, uniform_sample, universe_sample

        if kind not in ("uniform", "universe", "stratified"):
            raise ValueError(f"unknown sample kind {kind!r} (uniform|universe|stratified)")
        if kind == "universe" and not on:
            raise ValueError("universe samples need on=<key column>")
        if kind == "stratified" and (not on or not fractions):
            raise ValueError("stratified samples need on=<group column> and fractions={group: p}")
        if self.sample_exists(name):
            if not overwrite:
                raise ValueError(f"sample {name!r} already exists (use overwrite=True)")
            self.drop_sample(name)
        # pin the file list so the registered lineage matches exactly what
        # was sampled (refresh_sample covers later appends); basePath keeps
        # hive partition columns when reading an explicit file list
        from sketchlib.spark.scan import plan_chunks

        files = sorted({c.file for c in plan_chunks(input_dir)})
        df = self._read_files(input_dir, files)
        s = self._sample_of(df, kind, ratio, on, fractions, seed)
        sdir = os.path.join(self.root, "samples", name)
        s.write.mode("overwrite").parquet(sdir)
        persisted = self.spark.read.parquet(sdir)
        self._append_registry_row(
            "_sample_catalog", _SAMPLE_SCHEMA,
            (
                name, input_dir, kind, float(ratio), on or "", seed,
                _dir_num_rows(sdir), time.time(), json.dumps(fractions or {}),
                json.dumps(files),
            ),
        )
        return persisted

    def _read_files(self, input_dir: str, files: list[str]) -> DataFrame:
        """Read an explicit file list; basePath (directories only) keeps
        hive partition columns that live in the path, not the files."""
        reader = self.spark.read
        if os.path.isdir(input_dir):
            reader = reader.option("basePath", input_dir)
        return reader.parquet(*files)

    @staticmethod
    def _sample_of(df, kind: str, ratio: float, on, fractions, seed: int):
        from sketchlib.spark.sampling import stratified_sample, uniform_sample, universe_sample

        if kind == "uniform":
            return uniform_sample(df, ratio, seed)
        if kind == "universe":
            return universe_sample(df, on, ratio, seed)
        return stratified_sample(df, on, fractions, seed)

    def refresh_sample(self, name: str) -> dict:
        """Incremental scramble maintenance on APPEND — Verdict's actual
        sample-maintenance problem: apply the SAME sampling rule (kind,
        ratio/fractions, seed) to only the files added since the last
        build/refresh and append the surviving rows to the persisted sample.
        Exactness: Bernoulli inclusion is per-row independent and the
        universe hash rule is content-keyed, so sampling the append under
        the same rule is distributionally identical to re-sampling the
        grown table. Stratified caveat: strata are limited to the
        registered fractions — a NEW group value appearing only in the
        append is dropped (fraction 0), same as at create time.

        Covered files must still exist (samples can't subtract) — raises
        otherwise. Returns {new_files, rows_added}."""
        if not self.sample_exists(name):
            # append-only registry: a DROPPED sample's stale row must not
            # let refresh resurrect a partial table claiming full lineage
            raise ValueError(
                f"sample {name!r} has no data on disk (dropped or never "
                "created) — create_sample() it before refreshing"
            )
        reg = self._registry_meta("_sample_catalog", _SAMPLE_SCHEMA, name, "sample")
        if reg["files_json"] is None:
            raise ValueError(
                f"sample {name!r} was registered without file lineage — "
                "rebuild once with create_sample(overwrite=True) to enable refresh"
            )
        new, current = self._lineage_new_files(
            reg, "sample", "rebuild with create_sample(overwrite=True)"
        )
        if not new:
            return {"new_files": 0, "rows_added": 0}
        df = self._read_files(reg["input_dir"], new)
        fractions = json.loads(reg["fractions_json"]) or None
        s = self._sample_of(
            df, reg["kind"], reg["ratio"], reg["on_col"] or None, fractions, reg["seed"]
        )
        sdir = os.path.join(self.root, "samples", name)
        s.write.mode("append").parquet(sdir)
        n_total = _dir_num_rows(sdir)  # footer read, no Spark job
        self._append_registry_row(
            "_sample_catalog", _SAMPLE_SCHEMA,
            (
                name, reg["input_dir"], reg["kind"], reg["ratio"], reg["on_col"],
                reg["seed"], n_total, time.time(), reg["fractions_json"],
                json.dumps(sorted(current)),
            ),
        )
        return {"new_files": len(new), "rows_added": n_total - int(reg["rows_sampled"])}

    def sample_exists(self, name: str) -> bool:
        return os.path.isdir(os.path.join(self.root, "samples", name))

    def sample(self, name: str) -> DataFrame:
        if not self.sample_exists(name):
            raise ValueError(f"unknown sample {name!r}")
        return self.spark.read.parquet(os.path.join(self.root, "samples", name))

    def sample_meta(self, name: str):
        """Newest registration row for a persisted sample."""
        return self._registry_meta("_sample_catalog", _SAMPLE_SCHEMA, name, "sample")

    def list_samples(self) -> DataFrame:
        return self._registry_live("_sample_catalog", _SAMPLE_SCHEMA, "samples")

    def drop_sample(self, name: str) -> None:
        sdir = os.path.join(self.root, "samples", name)
        if os.path.isdir(sdir):
            shutil.rmtree(sdir)

    # --- persisted ANN indexes (VERDICT r2 #3) -------------------------------
    # The base embeddings are scanned exactly ONCE, at index build; every
    # later probe batch is answered from the SELF-CONTAINED index table
    # (id, bucket, vec) with a driver-side bucket IN-filter pushed to the
    # parquet scan. SRP indexes are bucket-sorted within files (row-group
    # pruning, zero build shuffle); IVF indexes are partitionBy(_list)
    # (partition pruning) with the coarse centroids in the registration row.

    def create_ann_index(
        self,
        name: str,
        input_dir: str,
        kind: str = "srp",
        vec_col: str = "embedding",
        id_col: str = "vec_id",
        n_bits: int = 16,
        seed: int = 31,
        n_lists: int = 16,
        sample_frac: float | None = None,
        overwrite: bool = False,
    ) -> DataFrame:
        """Build, persist, and register an ANN index; returns the index table."""
        import json as _json

        from sketchlib.spark.ann import ivf_index, srp_signatures

        if kind not in ("srp", "ivf"):
            raise ValueError(f"unknown ANN index kind {kind!r} (srp|ivf)")
        if self.ann_exists(name):
            if not overwrite:
                raise ValueError(f"ANN index {name!r} already exists (use overwrite=True)")
            self.drop_ann_index(name)
        from sketchlib.spark.scan import plan_chunks

        files = sorted({c.file for c in plan_chunks(input_dir)})
        df = self._read_files(input_dir, files)
        adir = os.path.join(self.root, "ann", name)
        centroids_json = ""
        if kind == "srp":
            # one mapInArrow pass emits (id, bucket, vec) — no join back to
            # the base; bucket-sort within files for row-group pruning
            idx = srp_signatures(df, vec_col, id_col, n_bits=n_bits, seed=seed, with_vec=True)
            idx.sortWithinPartitions("bucket").write.mode("overwrite").parquet(adir)
        else:
            import numpy as np

            assigned, centroids = ivf_index(
                df, vec_col, id_col, n_lists=n_lists, seed=seed, sample_frac=sample_frac
            )
            assigned.select(id_col, vec_col, "_list").write.mode("overwrite").partitionBy(
                "_list"
            ).parquet(adir)
            centroids_json = _json.dumps(np.asarray(centroids).tolist())
        persisted = self.spark.read.parquet(adir)
        row = [
            (
                name, input_dir, kind, vec_col, id_col, int(n_bits), int(seed),
                int(n_lists), centroids_json, _dir_num_rows(adir), time.time(),
                json.dumps(files),
            )
        ]
        self._append_registry_row("_ann_catalog", _ANN_SCHEMA, row[0])
        return persisted

    def refresh_ann_index(self, name: str) -> dict:
        """Incremental ANN-index maintenance on APPEND. SRP: signatures are
        content-keyed (same hyperplanes via the registered seed), so
        bucketing only the new rows appends exactly what a full rebuild
        would hold for them. IVF: new vectors go to their NEAREST FROZEN
        centroid (`ivf_assign`) — the registered centroid list defines the
        probe geometry, so assignment (not re-clustering) is the
        contract-preserving refresh; rebuild when drift warrants it.
        Covered files must still exist; returns {new_files, rows_added}."""
        import json as _json

        import numpy as np

        from sketchlib.spark.ann import ivf_assign, srp_signatures

        if not self.ann_exists(name):
            # same dropped-row resurrection guard as samples/signatures
            raise ValueError(
                f"ANN index {name!r} has no data on disk (dropped or never "
                "created) — create_ann_index() it before refreshing"
            )
        reg = self._registry_meta("_ann_catalog", _ANN_SCHEMA, name, "ANN index")
        if reg["files_json"] is None:
            raise ValueError(
                f"ANN index {name!r} was registered without file lineage — "
                "rebuild once with create_ann_index(overwrite=True) to enable refresh"
            )
        new, current = self._lineage_new_files(
            reg, "index", "rebuild with create_ann_index(overwrite=True)"
        )
        if not new:
            return {"new_files": 0, "rows_added": 0}
        df = self._read_files(reg["input_dir"], new)
        adir = os.path.join(self.root, "ann", name)
        if reg["kind"] == "srp":
            idx = srp_signatures(
                df, reg["vec_col"], reg["id_col"],
                n_bits=reg["n_bits"], seed=reg["seed"], with_vec=True,
            )
            idx.sortWithinPartitions("bucket").write.mode("append").parquet(adir)
        else:
            centroids = np.array(_json.loads(reg["centroids_json"]))
            assigned = ivf_assign(df, reg["vec_col"], reg["id_col"], centroids)
            assigned.write.mode("append").partitionBy("_list").parquet(adir)
        n_total = _dir_num_rows(adir)  # footer read, no Spark job
        self._append_registry_row(
            "_ann_catalog", _ANN_SCHEMA,
            (
                name, reg["input_dir"], reg["kind"], reg["vec_col"], reg["id_col"],
                reg["n_bits"], reg["seed"], reg["n_lists"], reg["centroids_json"],
                n_total, time.time(), _json.dumps(sorted(current)),
            ),
        )
        return {"new_files": len(new), "rows_added": n_total - int(reg["rows"])}

    def ann_exists(self, name: str) -> bool:
        return os.path.isdir(os.path.join(self.root, "ann", name))

    def ann_index(self, name: str) -> DataFrame:
        if not self.ann_exists(name):
            raise ValueError(f"unknown ANN index {name!r}")
        return self.spark.read.parquet(os.path.join(self.root, "ann", name))

    def ann_meta(self, name: str):
        """Newest registration row for a persisted ANN index."""
        return self._registry_meta("_ann_catalog", _ANN_SCHEMA, name, "ANN index")

    def list_ann_indexes(self) -> DataFrame:
        return self._registry_live("_ann_catalog", _ANN_SCHEMA, "ann")

    def drop_ann_index(self, name: str) -> None:
        adir = os.path.join(self.root, "ann", name)
        if os.path.isdir(adir):
            shutil.rmtree(adir)

    # --- persisted MinHash SIGNATURE tables (VERDICT r4 #1) ------------------
    # The artifact incremental dedup (dedup_delta) probes daily. The
    # registration row carries the FULL signing contract — (r, n_bands,
    # seed) plus input lineage — so a delta can never be signed with a
    # mismatched seed against this table: a seed mismatch makes every
    # MinHash comparison silently miss (zero recall, duplicates kept), the
    # one failure mode a dedup pipeline cannot observe from its output.
    # dedup_delta(catalog=..., catalog_key=...) reads the contract from
    # here and REFUSES an explicit conflicting seed.

    def create_signatures(
        self,
        name: str,
        input_dir: str,
        tokens_col: str = "tokens",
        id_col: str = "doc_id",
        r: int = 128,
        n_bands: int = 32,
        seed: int = 17,
        overwrite: bool = False,
    ) -> DataFrame:
        """Sign a token-array parquet table (ONE corpus scan, zero shuffle —
        minhash_signatures is a mapInArrow pass) and register the persisted
        (id, sig, bands) table with its signing contract."""
        from sketchlib.spark.dedup import minhash_signatures

        if r % n_bands != 0:
            raise ValueError(f"r={r} must be divisible by n_bands={n_bands}")
        if self.sig_exists(name):
            if not overwrite:
                raise ValueError(f"signature table {name!r} already exists (use overwrite=True)")
            self.drop_signatures(name)
        from sketchlib.spark.scan import plan_chunks

        files = sorted({c.file for c in plan_chunks(input_dir)})
        df = self._read_files(input_dir, files)
        sigs = minhash_signatures(df, tokens_col, id_col, r=r, n_bands=n_bands, seed=seed)
        sdir = os.path.join(self.root, "signatures", name)
        sigs.write.mode("overwrite").parquet(sdir)
        persisted = self.spark.read.parquet(sdir)
        self._register_sigs(
            name, input_dir, tokens_col, id_col, r, n_bands, seed,
            persisted.count(), json.dumps(files),
        )
        return persisted

    def _register_sigs(
        self, name, input_dir, tokens_col, id_col, r, n_bands, seed, rows, files_json
    ) -> None:
        self._append_registry_row(
            "_sig_catalog", _SIG_SCHEMA,
            (name, input_dir, tokens_col, id_col, int(r), int(n_bands),
             int(seed), int(rows), time.time(), files_json),
        )

    def refresh_signatures(self, name: str) -> dict:
        """Sign ONLY the parquet files appended to the input dir since the
        last build/refresh (content-keyed — the registered (r, n_bands,
        seed) make the new rows byte-identical to what a full rebuild would
        hold for them) and append. Covered files must still exist
        (signature tables cannot subtract); returns {new_files, rows_added}."""
        from sketchlib.spark.dedup import minhash_signatures

        reg = self._live_sig_meta(name)
        new, current = self._lineage_new_files(
            reg, "signature table", "rebuild with create_signatures(overwrite=True)"
        )
        if not new:
            return {"new_files": 0, "rows_added": 0}
        df = self._read_files(reg["input_dir"], new)
        sigs = minhash_signatures(
            df, reg["tokens_col"], reg["id_col"],
            r=reg["r"], n_bands=reg["n_bands"], seed=reg["seed"],
        )
        sdir = os.path.join(self.root, "signatures", name)
        sigs.write.mode("append").parquet(sdir)
        n_total = self.spark.read.parquet(sdir).count()
        self._register_sigs(
            name, reg["input_dir"], reg["tokens_col"], reg["id_col"],
            reg["r"], reg["n_bands"], reg["seed"], n_total, json.dumps(sorted(current)),
        )
        return {"new_files": len(new), "rows_added": n_total - int(reg["rows"])}

    def append_signatures(self, name: str, sig_df: DataFrame) -> dict:
        """Append already-signed rows — dedup_delta's kept-signature output —
        closing the daily loop THROUGH the catalog. The rows must have been
        signed under this table's registered contract; shape is verified
        against the registration (a wrong (r, n_bands) append would poison
        every later probe), and callers that signed outside
        ``dedup_delta(catalog=...)`` own the seed match. File lineage is
        unchanged (these rows have no input files); the registration row is
        re-stamped with the new total. Returns {rows_added}."""
        reg = self._live_sig_meta(name)
        first = sig_df.select("sig", "bands").first()
        if first is not None:
            got_r, got_b = len(first["sig"]), len(first["bands"])
            if (got_r, got_b) != (reg["r"], reg["n_bands"]):
                raise ValueError(
                    f"appended signatures have (r={got_r}, n_bands={got_b}) but "
                    f"{name!r} is registered with (r={reg['r']}, "
                    f"n_bands={reg['n_bands']}) — sign the rows via "
                    "dedup_delta(catalog=...) so the contract cannot drift"
                )
        sdir = os.path.join(self.root, "signatures", name)
        sig_df.write.mode("append").parquet(sdir)
        n_total = self.spark.read.parquet(sdir).count()
        self._register_sigs(
            name, reg["input_dir"], reg["tokens_col"], reg["id_col"],
            reg["r"], reg["n_bands"], reg["seed"], n_total, reg["files_json"],
        )
        return {"rows_added": n_total - int(reg["rows"])}

    def _live_sig_meta(self, name: str):
        """Registration row for a signature table that is ALIVE on disk.
        The registry log is append-only, so a DROPPED table's stale row
        would otherwise let refresh/append silently RESURRECT a partial
        table (new rows only, lineage claiming full coverage) — and a
        later dedup_delta probing it would keep every duplicate of the
        missing docs, the exact zero-recall failure the registry exists
        to prevent. Mutations must come through here, not _registry_meta."""
        if not self.sig_exists(name):
            raise ValueError(
                f"signature table {name!r} has no data on disk (dropped or "
                "never created) — create_signatures() it before refreshing "
                "or appending"
            )
        return self._registry_meta("_sig_catalog", _SIG_SCHEMA, name, "signature table")

    def sig_exists(self, name: str) -> bool:
        return os.path.isdir(os.path.join(self.root, "signatures", name))

    def signatures(self, name: str) -> DataFrame:
        if not self.sig_exists(name):
            raise ValueError(f"unknown signature table {name!r}")
        return self.spark.read.parquet(os.path.join(self.root, "signatures", name))

    def sig_meta(self, name: str):
        """Newest registration row for a persisted signature table."""
        return self._registry_meta("_sig_catalog", _SIG_SCHEMA, name, "signature table")

    def list_signatures(self) -> DataFrame:
        return self._registry_live("_sig_catalog", _SIG_SCHEMA, "signatures")

    def drop_signatures(self, name: str) -> None:
        sdir = os.path.join(self.root, "signatures", name)
        if os.path.isdir(sdir):
            shutil.rmtree(sdir)

    def ann_topk(
        self,
        name: str,
        queries,
        k: int = 10,
        query_ids=None,
        multiprobe: bool = True,
        nprobe: int = 4,
    ) -> DataFrame:
        """Answer a probe batch from the persisted index ALONE (the base
        table is never read — tested with it deleted). Output:
        (query_id, <id_col>, cosine), top-k per query."""
        import json as _json

        import numpy as np

        from sketchlib.spark.ann import ivf_probe_rows, srp_probe_rows, topk_from_bucketed_index

        meta = self.ann_meta(name)
        idx = self.ann_index(name)
        Q = np.asarray(queries, dtype=np.float64)
        if query_ids is None:
            query_ids = list(range(len(Q)))
        if meta["kind"] == "srp":
            probe_rows = srp_probe_rows(Q, query_ids, meta["n_bits"], meta["seed"], multiprobe)
            bucket_col = "bucket"
        else:
            centroids = np.asarray(_json.loads(meta["centroids_json"]))
            probe_rows = ivf_probe_rows(centroids, Q, query_ids, nprobe)
            bucket_col = "_list"
        return topk_from_bucketed_index(
            idx, bucket_col, probe_rows, Q, query_ids, meta["vec_col"], meta["id_col"], k=k
        )
