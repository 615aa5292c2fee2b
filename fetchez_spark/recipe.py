"""YAML/JSON job spec -- the ``Recipe``/``Pipeline`` analog.

Reference: declarative job spec with ``project``, ``execution.threads``,
per-module defs, global hooks, and a min-version integrity gate
(/root/reference/src/fetchez/recipe.py:77-253, pipeline.py:46-219).
Here the spec drives a SparkSession + source + transform chain + sink +
run mode.  (The reference's ``Recipe.launch`` is an infinite
self-recursion bug, recipe.py:183-186 -- not replicated.)

Spec shape::

    project: my-ingest
    min_engine_version: "0.1.0"
    execution: {cores: 8, shuffle_partitions: 16}
    schema: null            # optional config-mutator name (SchemaRegistry)
    source: {name: parquet_log, args: {log_dir: /data/log}}
    selection: "key:conv_00000000/conv_00zzzzzz ts:2024-01-01/-"
    transforms: [{transform: filter_regex, args: {column: role, pattern: "user|assistant"}}]
    sink: {name: local_snapshot, args: {table_dir: /data/table, num_buckets: 64}}
    run: {mode: replay, checkpoint_dir: /data/ckpt, lineage_dir: /data/lineage}

Multi-source jobs (reference ``modules[]`` lists with per-module region /
hook overrides, recipe.py:207-237) replace ``source:`` with ``sources:``
-- a list whose entries may each carry their own ``selection`` and
``transforms``, falling back to the recipe-global ones::

    sources:
      - {name: parquet_log, args: {log_dir: /data/log_a}}
      - name: parquet_log
        args: {log_dir: /data/log_b}
        selection: "key:conv_00000000/conv_00050000"   # per-source override
        transforms: [{transform: filter_regex, args: {column: role, pattern: user}}]

All sources replay into the ONE sink (per-source batch-token prefixes
keep exactly-once per source); per-source transforms run after the
global chain, mirroring module-hooks-after-global-hooks ordering.
"""

from __future__ import annotations

import json
import os
from collections.abc import Callable
from typing import Any

import yaml

from fetchez_spark import __version__

# ----------------------------------------------------------- schema mutators
# SchemaRegistry analog (/root/reference/src/fetchez/schema.py:21-64):
# named config -> config rewrites applied before plan construction.
_MUTATORS: dict[str, Callable[[dict], dict]] = {}


def register_mutator(name: str):
    def deco(fn):
        _MUTATORS[name] = fn
        return fn

    return deco


@register_mutator("default")
def _default(config: dict) -> dict:
    return config


@register_mutator("throughput")
def _throughput(config: dict) -> dict:
    """Preset: tune for sustained ingest (big batches, MoR, rare compaction)."""
    config.setdefault("sink", {}).setdefault("args", {}).update(
        {"mode": "mor", "compact_every": 32}
    )
    src_args = config.setdefault("source", {}).setdefault("args", {})
    src_args.setdefault("batch_files", 16)
    return config


def _parse_version(v: str) -> tuple[int, ...]:
    # dependency-free semver compare (recipe.py:45-54 analog)
    return tuple(int(x) for x in v.split(".")[:3])


class Recipe:
    def __init__(self, config: dict, base_dir: str = ".") -> None:
        self.config = config
        self.base_dir = base_dir
        gate = config.get("min_engine_version")
        if gate and _parse_version(__version__) < _parse_version(str(gate)):
            raise RuntimeError(
                f"recipe requires engine >= {gate}, this is {__version__}"
            )  # version gate, recipe.py:102-115
        mutator = (config.get("schema") or "default")
        if mutator not in _MUTATORS:
            raise KeyError(f"unknown schema mutator {mutator!r}")
        self.config = _MUTATORS[mutator](dict(config))

    @classmethod
    def from_file(cls, path: str) -> "Recipe":
        with open(path) as f:
            config = json.load(f) if path.endswith(".json") else yaml.safe_load(f)
        return cls(config, base_dir=os.path.dirname(os.path.abspath(path)))

    def _resolve_path(self, p: str) -> str:
        # path resolution relative to the recipe file (recipe.py:117-126)
        return p if os.path.isabs(p) else os.path.join(self.base_dir, p)

    def build(self, spark=None):
        from fetchez_spark.registry import load_plugins, make_sink, make_source
        from fetchez_spark.selection import Selection
        from fetchez_spark.session import get_spark
        from fetchez_spark.streaming.lineage import LineageLog
        from fetchez_spark.transforms import build_chain

        load_plugins()
        cfg = self.config
        execution = cfg.get("execution", {})
        if spark is None:
            spark = get_spark(
                app_name=cfg.get("project", "fetchez-spark"),
                master=f"local[{execution['cores']}]" if execution.get("cores") else None,
                shuffle_partitions=execution.get("shuffle_partitions"),
            )

        from fetchez_spark.transforms import expand_presets, load_preset_files

        load_preset_files()  # user preset YAML dir extends PRESETS
        global_selection = (
            Selection.parse(cfg["selection"]) if cfg.get("selection") else None
        )
        global_transforms = expand_presets(cfg.get("transforms", []), cfg.get("presets"))

        # normalize `source:` (single) and `sources:` (list) into units;
        # per-source selection/transforms fall back to the globals (the
        # reference's per-module region override, recipe.py:207-237)
        # `import` mode adopts files in place -- it has no change SOURCE,
        # so the source section is optional there (and only there)
        if cfg.get("sources") or cfg.get("source"):
            raw_units = cfg.get("sources") or [dict(cfg["source"])]
        elif cfg.get("run", {}).get("mode") == "import":
            raw_units = []
        else:
            raise KeyError(
                "recipe needs a `source:`/`sources:` section "
                "(only run mode `import` works without one)"
            )
        units = []
        for raw in raw_units:
            raw = dict(raw)
            src_args = {
                k: (self._resolve_path(v) if k.endswith("_dir") and isinstance(v, str) else v)
                for k, v in raw.get("args", {}).items()
            }
            selection = (
                Selection.parse(raw["selection"])
                if raw.get("selection")
                else global_selection
            )
            if selection is not None:
                src_args["selection"] = selection
            source = make_source(raw["name"], **src_args)
            chain = list(global_transforms) + list(raw.get("transforms", []))
            transforms = build_chain(chain)
            if selection is not None:
                # replay mode reads batch files directly, so the selection
                # also rides the transform chain (first op -> scan-pushed)
                pred = selection.predicate()
                transforms = [
                    (lambda p: lambda df: df.filter(p))(pred)
                ] + transforms
            units.append((source, transforms))

        sink_cfg = dict(cfg["sink"])
        sink_args = {
            k: (self._resolve_path(v) if k.endswith("_dir") and isinstance(v, str) else v)
            for k, v in sink_cfg.get("args", {}).items()
        }
        sink = make_sink(sink_cfg["name"], **sink_args)

        run_cfg = dict(cfg.get("run", {}))
        lineage = (
            LineageLog(self._resolve_path(run_cfg["lineage_dir"]))
            if run_cfg.get("lineage_dir")
            else None
        )
        return spark, units, sink, lineage, run_cfg

    def _catalog_open(self, sink):
        """Validate the recipe ``catalog:`` config against the built sink
        and return (catalog, name, note, table_dir).  Called BEFORE the
        run starts (a config typo must not discard hours of replay) and
        again by :meth:`_catalog_pin` after it succeeds."""
        cfg = self.config.get("catalog")
        if not cfg:
            return None
        if "dir" not in cfg:
            raise ValueError("recipe catalog: needs a 'dir' key")
        from fetchez_spark.catalog import TableCatalog

        cat = TableCatalog(self._resolve_path(cfg["dir"]))
        name = cfg.get("name") or self.config.get("project") or "table"
        note = cfg.get("note") or f"run {self.config.get('project') or name}"
        routes = getattr(sink, "routes", None)
        if routes is not None:
            # routed run: every route is its own table, pinned together
            # in ONE catalog commit as <name>.<route>
            targets = {}
            for rname, rsink in routes.items():
                tdir = getattr(rsink, "table_dir", None)
                if tdir is None:
                    raise ValueError(
                        f"recipe catalog: route {rname!r} sink has no "
                        f"table_dir (got {type(rsink).__name__})"
                    )
                targets[f"{name}.{rname}"] = (tdir, rsink)
        else:
            table_dir = getattr(sink, "table_dir", None)
            if table_dir is None:
                raise ValueError(
                    "recipe catalog: needs a sink with a table_dir "
                    f"(got {type(sink).__name__})"
                )
            targets = {name: (table_dir, sink)}
        registered = cat.manifest()["tables"]
        for tname, (tdir, _s) in targets.items():
            entry = registered.get(tname)
            if entry is not None and os.path.abspath(tdir) != entry["dir"]:
                raise ValueError(
                    f"catalog name {tname!r} is registered at "
                    f"{entry['dir']!r}, but this run writes "
                    f"{os.path.abspath(tdir)!r}"
                )
        return cat, name, note, targets

    def _catalog_pin(self, sink, result: dict[str, Any]) -> None:
        """Optional after-run bookkeeping: pin the output table in a
        multi-table catalog, so every successful run publishes a
        reproducible catalog version.  Spec::

            catalog: {dir: /data/catalog, name: convs, note: nightly}

        ``name`` defaults to ``project``.  First run registers the table;
        later runs re-pin it at the run's final head.  A sink writing to
        a WAP branch pins the BRANCH head — the run's actual output —
        not the unpublished main.  A name already registered at a
        DIFFERENT dir is a loud error."""
        opened = self._catalog_open(sink)
        if opened is None:
            return
        cat, name, note, targets = opened
        # a branch-staged run's data lives at the branch head; pinning
        # main would publish a catalog version missing the run's output.
        # A routed run pins EVERY route in one commit (atomic multi-table
        # publish: readers never see one route advanced, another stale).
        entries = {}
        for tname, (tdir, tsink) in targets.items():
            branch = getattr(tsink, "branch", "main")
            entries[tname] = {
                "dir": tdir, "ref": branch if branch != "main" else None,
            }
        m = cat.pin_tables(entries, note=note)
        result["catalog"] = {
            "dir": cat.catalog_dir, "name": name, "version": m["version"],
            "tables": sorted(entries),
        }

    # view kinds a `follow` recipe can daemonize: every incremental view
    # that persists its definition in its own store catalog (load() from
    # the dir alone), so the recipe needs only kind + store_dir
    _FOLLOW_KINDS = {
        "matview": ("fetchez_spark.operators.matview", "MaterializedAggregate"),
        "tokidx": ("fetchez_spark.operators.token_index", "TokenIndexView"),
        "vecidx": ("fetchez_spark.operators.vector_index", "VectorIndexView"),
        "conv": ("fetchez_spark.operators.conv_view", "ConversationView"),
        "scd2": ("fetchez_spark.operators.scd_view", "SCD2View"),
        "mirror": ("fetchez_spark.operators.mirror", "TableMirror"),
        "export": ("fetchez_spark.operators.export_view", "ParquetExportView"),
        "outbox": ("fetchez_spark.operators.outbox", "ChangeOutbox"),
    }

    def _run_follow(self, spark, dry_run: bool = False) -> dict[str, Any]:
        """``run: {mode: follow}`` — the declarative DAEMON spec for any
        incremental view: define the view once (API or CLI), then the
        recipe keeps it continuously current against its source's commit
        pointer.  The ``view:`` section names only ``kind`` + ``store_dir``
        (the definition — aggregate spec, centroids, rendering, attrs —
        persists in the view store's own catalog)::

            view: {kind: matview, store_dir: /data/mv}
            run:  {mode: follow, poll_seconds: 2, timeout_sec: 600}

        No ``source:``/``sink:`` sections: the view knows its upstream.
        (Reference analog: Recipe.launch's always-on re-fetch loop,
        /root/reference/src/fetchez/recipe.py:183-186 — here as a
        bounded, crash-resumable CDC consumer.)"""
        import importlib

        from fetchez_spark.session import get_spark

        cfg = self.config
        run_cfg = cfg.get("run") or {}
        specs = cfg.get("views")
        if specs is None:
            specs = [cfg.get("view") or {}]
        if not isinstance(specs, list) or not specs:
            raise ValueError("run mode `follow` needs a view: or views: section")

        views, infos = [], []
        for vc in specs:
            kind = (vc or {}).get("kind")
            if kind not in self._FOLLOW_KINDS:
                raise ValueError(
                    f"run mode `follow` needs view.kind in "
                    f"{sorted(self._FOLLOW_KINDS)}; got {kind!r}"
                )
            if not vc.get("store_dir"):
                raise ValueError("run mode `follow` needs view.store_dir")
            store_dir = self._resolve_path(vc["store_dir"])
            opts = vc.get("options") or {}
            if opts:
                # fail at recipe load, not mid-daemon with a TypeError
                if kind != "outbox":
                    raise ValueError(
                        f"view options are only supported for outbox views "
                        f"(got options on kind {kind!r})"
                    )
                unknown = set(opts) - {"rebase_every", "keep_batches"}
                if unknown:
                    raise ValueError(
                        f"unknown outbox options {sorted(unknown)}; allowed: "
                        "rebase_every, keep_batches"
                    )
            mod, cls_name = self._FOLLOW_KINDS[kind]
            view = getattr(importlib.import_module(mod), cls_name).load(store_dir)
            views.append(view)
            infos.append(
                {"kind": kind, "store_dir": store_dir,
                 "upstream": view.source.table_dir}
            )
        one = len(views) == 1
        out: dict[str, Any] = {"mode": "follow"}
        out.update(infos[0] if one else {"views": infos})
        if dry_run:
            applied = [v.last_applied() for v in views]
            return {**out, "applied": applied[0] if one else applied}
        if spark is None:
            execution = cfg.get("execution", {})
            spark = get_spark(
                app_name=cfg.get("project", "fetchez-spark"),
                master=(
                    f"local[{execution['cores']}]" if execution.get("cores") else None
                ),
                shuffle_partitions=execution.get("shuffle_partitions"),
            )
        poll = run_cfg.get("poll_seconds", 2.0)
        timeout = run_cfg.get("timeout_sec", 3600)
        if one:
            # per-kind follow extras (e.g. outbox {rebase_every, keep_batches})
            opts = (specs[0] or {}).get("options") or {}
            refreshes = list(
                views[0].follow(
                    spark, poll_seconds=poll, timeout_seconds=timeout, **opts
                )
            )
            return {
                **out, "refreshes": refreshes, "applied": views[0].last_applied()
            }
        # N views, ONE daemon loop (the realistic deployment: a table's
        # whole derived family — views, mirror, export, outbox — kept
        # current by a single poller; sources may even differ per view)
        import time as _time

        deadline = _time.monotonic() + timeout
        refreshes: list[dict] = []
        counts = [0] * len(views)
        while _time.monotonic() < deadline:
            advanced = False
            for i, (v, info) in enumerate(zip(views, infos)):
                if v.source.current_snapshot_id != v.last_applied():
                    r = v.refresh(spark)
                    refreshes.append({**info, **r})
                    advanced = True
                    counts[i] += 1
                    o = (specs[i] or {}).get("options") or {}
                    cadence = o.get("rebase_every")
                    if cadence and counts[i] % int(cadence) == 0:
                        refreshes.append(
                            {
                                **info,
                                "rebase": v.rebase(
                                    spark,
                                    keep_batches=int(o.get("keep_batches", 2)),
                                ),
                            }
                        )
            if not advanced:
                _time.sleep(poll)
        return {
            **out,
            "refreshes": refreshes,
            "applied": [v.last_applied() for v in views],
        }

    def run(self, spark=None, dry_run: bool = False) -> dict[str, Any]:
        from fetchez_spark.streaming.engine import replay_batches, run_stream

        if (self.config.get("run") or {}).get("mode") == "follow":
            # no source/sink sections: the view IS the job
            return self._run_follow(spark, dry_run=dry_run)
        spark, units, sink, lineage, run_cfg = self.build(spark)
        mode = run_cfg.get("mode", "replay")
        self._catalog_open(sink)  # fail fast on catalog config typos
        if dry_run:
            plans = []
            for source, transforms in units:
                df = source.read(spark)
                for t in transforms:
                    df = t(df)
                plans.append(df._jdf.queryExecution().toString())
            return {"mode": "dry_run", "plan": "\n".join(plans)}
        if mode == "replay":
            all_results = []
            for i, (source, transforms) in enumerate(units):
                prefix = run_cfg.get("token_prefix", "replay")
                if len(units) > 1:
                    prefix = f"{prefix}-s{i}"  # exactly-once per source
                all_results.extend(
                    replay_batches(
                        spark,
                        source.batches(spark),
                        sink,
                        lineage=lineage,
                        transforms=transforms,
                        token_prefix=prefix,
                        file_format=getattr(source, "log_format", "parquet"),
                    )
                )
            out = {"mode": mode, "batches": all_results}
            self._catalog_pin(sink, out)
            return out
        if mode == "stream":
            # N sources = N concurrent streaming queries into the ONE sink:
            # each gets its own checkpoint subdir and batch-token prefix, so
            # tokens never collide and the sink's commit lock + MoR append
            # reconciliation interleave their commits safely (the reference
            # unions N modules into one run, core.py:822-832).
            ckpt = self._resolve_path(run_cfg["checkpoint_dir"])
            if run_cfg.get("supervised"):
                # self-healing tails: automatic mid-stream additive schema
                # evolution (run_stream_supervised restarts a query whose
                # log grew new columns; exactly-once via checkpoint +
                # tokens).  Each source supervises in its own thread so N
                # sources still drain concurrently.
                import threading

                from fetchez_spark.streaming.engine import run_stream_supervised

                results: list[dict] = [None] * len(units)  # type: ignore[list-item]
                errs: list[BaseException] = []

                def _supervise(i: int, source, transforms) -> None:
                    prefix = run_cfg.get("token_prefix")
                    if len(units) > 1:
                        prefix = f"{prefix or 'stream'}-s{i}"
                    try:
                        results[i] = run_stream_supervised(
                            spark,
                            source.log_dir,
                            sink,
                            os.path.join(ckpt, f"s{i}") if len(units) > 1 else ckpt,
                            schema=source.schema,
                            log_format=getattr(source, "log_format", "parquet"),
                            max_files_per_trigger=source.max_files_per_trigger,
                            lineage=lineage,
                            transforms=transforms,
                            available_now=run_cfg.get("available_now", True),
                            token_prefix=prefix,
                            timeout_sec=run_cfg.get("timeout_sec"),
                            trigger_interval=run_cfg.get("trigger_interval"),
                            source_options=run_cfg.get("source_options"),
                        )
                    except BaseException as e:  # surfaced to the caller
                        errs.append(e)

                threads = [
                    threading.Thread(target=_supervise, args=(i, s, t), daemon=True)
                    for i, (s, t) in enumerate(units)
                ]
                for t in threads:
                    t.start()
                # timeout_sec may be absent (default 1h) or explicitly
                # None (unbounded drain -- join forever); a finite value
                # gets slack for the supervisor's own stop handshake, and
                # a thread still alive after it is an ERROR, never a
                # silent runs=[None] success
                timeout = run_cfg.get("timeout_sec", 3600)
                join_for = None if timeout is None else timeout + 60
                for t in threads:
                    t.join(join_for)
                if errs:
                    raise errs[0]
                if any(t.is_alive() for t in threads):
                    raise TimeoutError(
                        f"supervised stream drain exceeded timeout_sec={timeout}; "
                        "raise run.timeout_sec or pass timeout_sec: null for an "
                        "unbounded drain"
                    )
                out = {"mode": mode, "supervised": True, "runs": results}
                self._catalog_pin(sink, out)
                return out
            queries = []
            for i, (source, transforms) in enumerate(units):
                # None -> run_stream derives a per-checkpoint-dir prefix,
                # so even single-source recipes never share the empty
                # watermark namespace with another writer of the table
                prefix = run_cfg.get("token_prefix")
                if len(units) > 1:
                    prefix = f"{prefix or 'stream'}-s{i}"
                queries.append(
                    run_stream(
                        spark,
                        source.log_dir,
                        sink,
                        checkpoint_dir=(
                            os.path.join(ckpt, f"s{i}") if len(units) > 1 else ckpt
                        ),
                        schema=source.schema,
                        log_format=getattr(source, "log_format", "parquet"),
                        max_files_per_trigger=source.max_files_per_trigger,
                        lineage=lineage,
                        transforms=transforms,
                        available_now=run_cfg.get("available_now", True),
                        token_prefix=prefix,
                        trigger_interval=run_cfg.get("trigger_interval"),
                        source_options=run_cfg.get("source_options"),
                    )
                )
            timeout = run_cfg.get("timeout_sec", 3600)
            for q in queries:
                q.awaitTermination(timeout)
            out = {"mode": mode, "query_ids": [str(q.id) for q in queries]}
            self._catalog_pin(sink, out)
            return out
        if mode == "import":
            # declarative zero-copy adoption (the add_files analog as a
            # job spec): point the recipe at parquet paths; incremental
            # recipes re-run as drop-folder polls
            res = sink.import_files(
                spark,
                [self._resolve_path(p) for p in run_cfg["paths"]],
                batch_token=run_cfg.get("token"),
                validate=run_cfg.get("validate", True),
                incremental=run_cfg.get("incremental", False),
                collect_stats=run_cfg.get("collect_stats", False),
            )
            out = {"mode": mode, **res}
            self._catalog_pin(sink, out)
            return out
        raise ValueError(f"unknown run mode {mode!r}")
