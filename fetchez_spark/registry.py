"""Source / sink registries with search, info, and plugin discovery.

Reimagines the reference's module registry (class-level dict of
name -> {mod, cls, category, desc, tags, aliases}, lazy importlib class
loading, plugin dirs, pip entry points, full-text search --
/root/reference/src/fetchez/registry.py:42-1215).  Transforms have their
own registry in :mod:`fetchez_spark.transforms`.
"""

from __future__ import annotations

import importlib
import os
import sys
from dataclasses import dataclass, field
from typing import Any


@dataclass
class SourceInfo:
    name: str
    cls: str  # "module:Class", resolved lazily
    category: str
    desc: str
    tags: list[str] = field(default_factory=list)
    aliases: list[str] = field(default_factory=list)


_SOURCES: dict[str, SourceInfo] = {}
_SINKS: dict[str, SourceInfo] = {}


def _inherit(info: SourceInfo, table: dict[str, SourceInfo], extends: str | None) -> SourceInfo:
    """Metadata inheritance (registry.py:1021-1054): a child entry fills
    its empty category/desc/tags from the parent it extends; tags union."""
    if not extends:
        return info
    parent = table.get(extends)
    if parent is None:
        raise KeyError(f"extends unknown entry {extends!r}")
    return SourceInfo(
        name=info.name,
        cls=info.cls or parent.cls,
        category=info.category or parent.category,
        desc=info.desc or parent.desc,
        tags=sorted(set(parent.tags) | set(info.tags)),
        aliases=info.aliases,
    )


def register_source(info: SourceInfo, extends: str | None = None) -> None:
    """Dynamic registration (registry.py:1189-1215 analog)."""
    _SOURCES[info.name] = _inherit(info, _SOURCES, extends)


def register_sink(info: SourceInfo, extends: str | None = None) -> None:
    _SINKS[info.name] = _inherit(info, _SINKS, extends)


def _resolve(ref: str):
    """Lazy class loading (registry.py:1056-1080): 'pkg.mod:Class'."""
    mod_name, _, cls_name = ref.partition(":")
    mod = importlib.import_module(mod_name)
    try:
        return getattr(mod, cls_name)
    except AttributeError as e:
        raise ImportError(f"registry entry points at missing class {ref!r}") from e


def get_source_class(name: str):
    info = _SOURCES.get(name) or next(
        (s for s in _SOURCES.values() if name in s.aliases), None
    )
    if info is None:
        raise KeyError(f"unknown source {name!r}; known: {sorted(_SOURCES)}")
    return _resolve(info.cls)


def get_sink_class(name: str):
    if name not in _SINKS:
        raise KeyError(f"unknown sink {name!r}; known: {sorted(_SINKS)}")
    return _resolve(_SINKS[name].cls)


def list_sources() -> list[SourceInfo]:
    return sorted(_SOURCES.values(), key=lambda s: s.name)


def list_sinks() -> list[SourceInfo]:
    return sorted(_SINKS.values(), key=lambda s: s.name)


def search(term: str) -> list[SourceInfo]:
    """Full-text search over name/desc/tags (registry.py:1161-1187)."""
    t = term.lower()
    return [
        s
        for s in list_sources() + list_sinks()
        if t in s.name.lower()
        or t in s.desc.lower()
        or t in s.category.lower()
        or any(t in x.lower() for x in s.tags)
    ]


def info(name: str) -> SourceInfo | None:
    return _SOURCES.get(name) or _SINKS.get(name)


def load_plugins(plugin_dir: str | None = None) -> list[str]:
    """User plugin discovery (registry.py:1082-1143): import every *.py in
    the plugin dir; modules self-register via register_source/register_sink
    or a ``setup_fetchez_spark(registry)`` function (entry-point analog,
    registry.py:1145-1159)."""
    if plugin_dir is None:
        from fetchez_spark.config import plugin_dir as _cfg_plugin_dir

        plugin_dir = _cfg_plugin_dir()  # user config file can move it
    loaded: list[str] = load_entry_point_plugins()
    if not os.path.isdir(plugin_dir):
        return loaded
    sys.path.insert(0, plugin_dir)
    try:
        for fn in sorted(os.listdir(plugin_dir)):
            if not fn.endswith(".py") or fn.startswith("_"):
                continue
            mod_name = fn[:-3]
            try:
                mod = importlib.import_module(mod_name)
                if hasattr(mod, "setup_fetchez_spark"):
                    mod.setup_fetchez_spark(sys.modules[__name__])
                loaded.append(mod_name)
            except Exception:
                # a broken plugin must not take the engine down
                # (registry.py:1117-1121 swallows plugin import errors)
                continue
    finally:
        sys.path.remove(plugin_dir)
    return loaded


def load_entry_point_plugins(group: str = "fetchez_spark.plugins") -> list[str]:
    """Pip entry-point plugin discovery (registry.py:1145-1159): any
    installed distribution exposing ``[project.entry-points.
    "fetchez_spark.plugins"]`` gets its hook called with this registry
    module.  Broken plugins are skipped, same policy as the plugin dir."""
    import importlib.metadata as md

    loaded: list[str] = []
    try:
        eps = md.entry_points(group=group)
    except Exception:
        return loaded
    for ep in eps:
        try:
            hook = ep.load()
            hook(sys.modules[__name__])
            loaded.append(ep.name)
        except Exception:
            continue
    return loaded


# ---------------------------------------------------------------- built-ins
register_source(
    SourceInfo(
        "parquet_log",
        "fetchez_spark.sources.parquet_log:ParquetLogSource",
        "log",
        "offset-partitioned parquet change log (batch + streaming tail)",
        tags=["cdc", "parquet", "stream"],
        aliases=["file", "log"],
    )
)
register_source(
    SourceInfo(
        "orc_log",
        "fetchez_spark.sources.parquet_log:OrcLogSource",
        "log",
        "offset-partitioned ORC change log (batch + streaming tail; "
        "self-describing footers, so inference and the mid-stream "
        "schema-evolution guard work exactly as for parquet)",
        tags=["cdc", "orc", "stream"],
        aliases=["orc"],
    )
)
register_source(
    SourceInfo(
        "inline",
        "fetchez_spark.sources.inline:InlineSource",
        "passthrough",
        "single-entry passthrough: rows supplied literally by the caller "
        "(the https one-URL-one-entry module analog)",
        tags=["inline", "passthrough", "manual"],
        aliases=["https", "entry"],
    )
)
register_source(
    SourceInfo(
        "synthetic",
        "fetchez_spark.sources.parquet_log:SyntheticSource",
        "log",
        "deterministic generated change log (seeded; tests/bench)",
        tags=["cdc", "synthetic", "generator"],
    )
)
register_sink(
    SourceInfo(
        "local_snapshot",
        "fetchez_spark.sinks.local_snapshot:LocalSnapshotSink",
        "table",
        "parquet+manifest table with Iceberg snapshot semantics (MoR/CoW)",
        tags=["iceberg", "snapshot", "merge"],
        aliases=["table", "iceberg_local"],
    )
)
register_sink(
    SourceInfo(
        "iceberg",
        "fetchez_spark.sinks.iceberg:IcebergSink",
        "table",
        "real Apache Iceberg table via MERGE INTO (requires "
        "iceberg-spark-runtime on the classpath; not bundled here)",
        tags=["iceberg", "merge"],
    )
)
register_sink(
    SourceInfo(
        "router",
        "fetchez_spark.sinks.router:RouterSink",
        "table",
        "demux one change stream into N tables by discriminator column "
        "or predicate (exactly-once per route via sub-tokens)",
        tags=["cdc", "router", "demux", "multi-table"],
        aliases=["demux"],
    )
)


def make_source(name: str, **kwargs) -> Any:
    return get_source_class(name)(**kwargs)


def make_sink(name: str, **kwargs) -> Any:
    """Construct a sink; user-config ``sink:`` defaults fill kwargs the
    caller left unset (explicit recipe/CLI args always win), filtered to
    params the class actually accepts (so one config serves sinks with
    different signatures)."""
    import inspect

    from fetchez_spark.config import sink_defaults

    cls = get_sink_class(name)
    accepted = set(inspect.signature(cls.__init__).parameters)
    defaults = {
        k: v for k, v in sink_defaults().items() if k in accepted and k not in kwargs
    }
    return cls(**{**defaults, **kwargs})
