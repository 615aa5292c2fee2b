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

        src_cfg = dict(cfg["source"])
        src_args = {
            k: (self._resolve_path(v) if k.endswith("_dir") and isinstance(v, str) else v)
            for k, v in src_cfg.get("args", {}).items()
        }
        selection = Selection.parse(cfg["selection"]) if cfg.get("selection") else None
        if selection is not None:
            src_args["selection"] = selection
        source = make_source(src_cfg["name"], **src_args)

        sink_cfg = dict(cfg["sink"])
        sink_args = {
            k: (self._resolve_path(v) if k.endswith("_dir") and isinstance(v, str) else v)
            for k, v in sink_cfg.get("args", {}).items()
        }
        sink = make_sink(sink_cfg["name"], **sink_args)

        from fetchez_spark.transforms import expand_presets

        transforms = build_chain(
            expand_presets(cfg.get("transforms", []), cfg.get("presets"))
        )
        if selection is not None:
            # replay mode reads batch files directly, so the selection also
            # rides the transform chain (first op -> still scan-pushed)
            pred = selection.predicate()
            transforms = [lambda df: df.filter(pred)] + transforms
        run_cfg = dict(cfg.get("run", {}))
        lineage = (
            LineageLog(self._resolve_path(run_cfg["lineage_dir"]))
            if run_cfg.get("lineage_dir")
            else None
        )
        return spark, source, sink, transforms, lineage, run_cfg

    def run(self, spark=None, dry_run: bool = False) -> dict[str, Any]:
        from fetchez_spark.streaming.engine import replay_batches, run_stream

        spark, source, sink, transforms, lineage, run_cfg = self.build(spark)
        mode = run_cfg.get("mode", "replay")
        if dry_run:
            df = source.read(spark)
            for t in transforms:
                df = t(df)
            return {"mode": "dry_run", "plan": df._jdf.queryExecution().toString()}
        if mode == "replay":
            results = replay_batches(
                spark,
                source.batches(spark),
                sink,
                lineage=lineage,
                transforms=transforms,
                token_prefix=run_cfg.get("token_prefix", "replay"),
            )
            return {"mode": mode, "batches": results}
        if mode == "stream":
            query = run_stream(
                spark,
                source.log_dir,
                sink,
                checkpoint_dir=self._resolve_path(run_cfg["checkpoint_dir"]),
                schema=source.schema,
                max_files_per_trigger=source.max_files_per_trigger,
                lineage=lineage,
                transforms=transforms,
                available_now=run_cfg.get("available_now", True),
            )
            query.awaitTermination(run_cfg.get("timeout_sec", 3600))
            return {"mode": mode, "query_id": str(query.id)}
        raise ValueError(f"unknown run mode {mode!r}")
